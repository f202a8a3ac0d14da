"""Detector characterization from flat/dark ramps (solid-waffle analog).

The reference delegates linearity/gain/IPC *measurement* to the
external solid-waffle package and only consumes its output files
(SURVEY.md §2.3).  This module internalizes the core characterization
so the framework's calibration production is fully self-contained,
TPU-first:

- :func:`fit_linearity` — per-pixel Legendre linearity curves from
  flat-field ramps: an alternating least-squares fit of a shared
  monotone response map g(S) (Legendre in the rescaled signal) and
  per-ramp flux rates, batched over all pixels as fused normal-equation
  accumulations (no per-pixel Python).  Output follows the
  ``linearitylegendre`` reference-file convention (Slin = 0 and
  dSlin/dS = 1 at Sref).
- :func:`gain_from_mean_variance` — photon-transfer gain per superpixel
  from flat/dark difference frames: g = mean(signal) / var(diff/sqrt2).
- :func:`ipc_from_autocorr` — IPC alphas from nearest-neighbor
  autocorrelations of flat difference frames (correlation method:
  alpha ~ C(d)/ (2 C(0)) for shot-noise-dominated diffs).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.legendre import legendre_basis_1d


def _legendre_design(z, order):
    """(order+1, ...) stack of P_L(z)."""
    return legendre_basis_1d(order, z)


@functools.partial(jax.jit, static_argnames=("p_order", "n_iter"))
def _linfit_core(stacked, smin, smax, sref, tw, t2sum, *, p_order,
                 n_iter):
    """The whole linearity fit as ONE jitted program (the repo rule:
    all device code under jit — eager dispatch of the (nc, nsamp, ny,
    nx) Legendre stack and the normal-equation einsums is both
    unreliable on the relay backend and materializes intermediates XLA
    would otherwise fuse).

    ``tw``: (nramp, nsamp) per-ramp frame times (zero outside the
    ramp); ``t2sum``: (nramp,) sum of squared times per ramp.
    Returns (coef_out (nc, ny, nx), dg_ds (ny, nx)).
    """
    nc = p_order + 1
    ny, nx = stacked.shape[-2:]
    nramp = tw.shape[0]

    z = -1.0 + 2.0 * (stacked - smin[None]) / (smax - smin)[None]
    z = jnp.clip(z, -1.0, 1.0)
    P = _legendre_design(z, p_order)  # (nc, nsamp, ny, nx)

    # Eliminating the per-ramp rates analytically, the response
    # coefficients minimize c^T M c with
    #   M = sum_k b_k b_k^T - sum_r (w_r w_r^T) / sum_{k in r} t_k^2,
    #   b_k = P(z_k),  w_r = sum_{k in r} t_k b_k
    # (the quadratic form of residuals after projecting out each
    # ramp's best linear-in-time fit).  The response is M's
    # near-null eigenvector; batched inverse iteration finds it.
    M = jnp.einsum("ikyx,jkyx->ijyx", P, P)
    for r in range(nramp):
        w = jnp.einsum("ikyx,k->iyx", P, tw[r])
        M = M - jnp.einsum("iyx,jyx->ijyx", w, w) / t2sum[r]
    MT = jnp.moveaxis(M, (0, 1), (-2, -1))  # (ny, nx, nc, nc)
    eps = 1e-5 * jnp.trace(MT, axis1=-2, axis2=-1)[..., None, None] / nc
    MT = MT + eps * jnp.eye(nc)
    # start from the z-linear response (coef = e_1)
    x = jnp.zeros((ny, nx, nc)).at[..., 1].set(1.0)

    def body(x, _):
        x = jnp.linalg.solve(MT, x[..., None])[..., 0]
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=n_iter)
    coef = jnp.moveaxis(x, -1, 0)  # (nc, ny, nx)

    # gauge fix at Sref: value 0, derivative 1
    zref = -1.0 + 2.0 * (sref - smin) / (smax - smin)
    Pref = _legendre_design(zref, p_order)  # (nc, ny, nx)
    g_ref = jnp.einsum("iyx,iyx->yx", coef, Pref)
    # derivative dP_L/dz via finite difference of the basis (exact
    # would use the derivative recursion; h small vs the domain)
    h = 1e-3
    Pref_p = _legendre_design(zref + h, p_order)
    Pref_m = _legendre_design(zref - h, p_order)
    dg_dz = jnp.einsum("iyx,iyx->yx", coef, (Pref_p - Pref_m) / (2 * h))
    dz_ds = 2.0 / (smax - smin)
    dg_ds = dg_dz * dz_ds
    dg_ds = jnp.where(jnp.abs(dg_ds) < 1e-8, 1e-8, dg_ds)

    coef_out = coef / dg_ds[None]
    coef_out = coef_out.at[0].add(-g_ref / dg_ds)
    return coef_out, dg_ds


def fit_linearity(ramps, t_arrays, sref_frame_value, *, p_order=6,
                  smin=None, smax=None, n_iter=4, sat_fraction=0.93):
    """Fit per-pixel Legendre linearity curves from ramp cubes.

    Parameters
    ----------
    ramps : list of (nframes_r, ny, nx) float32
        Raw-DN ramp cubes (e.g. high flat, low flat); each assumed to
        accrue charge linearly in time at an unknown per-pixel rate.
    t_arrays : list of (nframes_r,) float
        Frame times of each ramp (same clock).
    sref_frame_value : (ny, nx) float32
        Raw DN defining the linearized zero (the bias frame — the
        reference's BIAS SLICE).
    p_order : Legendre order of the fitted response.
    smin, smax : optional (ny, nx) domain bounds; default: data range
        padded (the reference's NEGATIVEPAD below bias) and the
        ``sat_fraction`` quantile of the brightest ramp.
    n_iter : alternating-fit iterations.

    Returns
    -------
    dict with ``data`` (p_order+1, ny, nx), ``Smin``, ``Smax``, ``Sref``,
    ``dq`` — the ``linearitylegendre`` tree payload.

    Model: a shared monotone map g(S) (per pixel) with g(S_k) ~ a_r t_k
    for each ramp r.  Gauge fixing: g -> (g - g(Sref)) / g'(Sref) makes
    Slin = 0 and slope 1 at Sref, matching the reference convention
    (``docs/from_sim_README.rst`` linearity spec).
    """
    # host-side assembly (numpy): shapes, ramp bookkeeping, default
    # domain bounds — only the fit itself touches the device
    stacked = np.concatenate(
        [np.asarray(r, np.float32) for r in ramps], axis=0
    )
    ramp_id = np.concatenate(
        [np.full(r.shape[0], i, np.int32) for i, r in enumerate(ramps)]
    )
    tvec = np.concatenate([np.asarray(t, np.float64) for t in t_arrays])
    nramp = len(ramps)
    tw = np.stack(
        [np.where(ramp_id == r, tvec, 0.0) for r in range(nramp)]
    ).astype(np.float32)
    t2sum = np.array(
        [np.sum(tvec[ramp_id == r] ** 2) for r in range(nramp)],
        np.float32,
    )

    if smin is None:
        smin = np.minimum(
            stacked.min(axis=0), np.asarray(sref_frame_value)
        ) - 500.0  # NEGATIVEPAD
    if smax is None:
        smax = stacked.max(axis=0) / sat_fraction

    coef_out, dg_ds = _linfit_core(
        jnp.asarray(stacked), jnp.asarray(smin, jnp.float32),
        jnp.asarray(smax, jnp.float32),
        jnp.asarray(sref_frame_value, jnp.float32),
        jnp.asarray(tw), jnp.asarray(t2sum),
        p_order=p_order, n_iter=n_iter,
    )

    dq = np.where(
        np.asarray(dg_ds) <= 1e-6, 1, 0
    ).astype(np.uint32)

    return {
        "data": np.asarray(coef_out, np.float32),
        "Smin": np.asarray(smin, np.float32),
        "Smax": np.asarray(smax, np.float32),
        "Sref": np.asarray(sref_frame_value, np.float32),
        "dq": dq,
    }


def make_linearity_file(out_path, sca, ramps, t_arrays, sref_frame_value,
                        *, p_order=6, pflat=None, dark_slope=None, **kw):
    """Fit and write a ``linearitylegendre`` reference file.

    The internal replacement for the external solid-waffle linearity
    run (whose JSON config ``calib.swconfig.linearity_config`` emits).
    Optional ``pflat``/``dark_slope`` planes are carried into the tree
    as the reference files do.
    """
    from . import ref_meta
    from ..io import asdf_lite

    fit = fit_linearity(ramps, t_arrays, sref_frame_value,
                        p_order=p_order, **kw)
    ny, nx = fit["Smin"].shape
    tree = {
        "roman": {
            "meta": ref_meta(
                "LINEARITYLEGENDRE", sca, "internal linearity fit",
                author="romanimpreprocess_tpu.calib.characterize",
            ),
            "data": fit["data"],
            "dq": fit["dq"],
            "Smin": fit["Smin"],
            "Smax": fit["Smax"],
            "Sref": fit["Sref"],
            "pflat": (
                np.asarray(pflat, np.float32) if pflat is not None
                else np.ones((ny, nx), np.float32)
            ),
            "dark": (
                np.asarray(dark_slope, np.float32) if dark_slope is not None
                else np.zeros((ny, nx), np.float32)
            ),
            "ramperr": np.ones((2, ny, nx), np.uint16),
        }
    }
    asdf_lite.AsdfFile(tree).write_to(out_path)
    return out_path


def gain_from_mean_variance(flat_cube, superpixel=32, read_var=0.0):
    """Photon-transfer gain per superpixel (e/DN), expanded full-frame.

    Uses consecutive-frame differences of a flat ramp (= independent
    Poisson increments): mean m DN, variance m/g + 2 sigma_read^2, so
    g = m / (var - 2 read_var).  ``read_var`` (sigma_read^2, DN^2, e.g.
    from dark diffs) subtracts the read-noise floor; the reference's
    solid-waffle does the full correlation analysis — this is the
    classical photon-transfer estimate.
    """
    return np.asarray(_gain_core(
        jnp.asarray(flat_cube, jnp.float32),
        jnp.float32(read_var), superpixel=superpixel,
    ))


@functools.partial(jax.jit, static_argnames=("superpixel",))
def _gain_core(flat_cube, read_var, *, superpixel):
    diffs = flat_cube[1:] - flat_cube[:-1]  # (nd, ny, nx) increments
    ny, nx = diffs.shape[-2:]
    k = superpixel
    nsy, nsx = ny // k, nx // k
    d = diffs[:, : nsy * k, : nsx * k].reshape(-1, nsy, k, nsx, k)
    # per-pixel temporal stats (spatial flat structure cancels), then
    # superpixel averages
    mean_pix = jnp.mean(d, axis=0)
    var_pix = jnp.var(d, axis=0)
    mean_sig = jnp.mean(mean_pix, axis=(1, 3))
    var_sig = jnp.mean(var_pix, axis=(1, 3)) - 2.0 * read_var
    gain_sp = mean_sig / jnp.clip(var_sig, 1e-6, None)
    gain = jnp.repeat(jnp.repeat(gain_sp, k, axis=0), k, axis=1)
    out = jnp.ones((ny, nx), jnp.float32)
    return out.at[: nsy * k, : nsx * k].set(gain)


def ipc_from_autocorr(flat_cube, nborder=4):
    """IPC alphas (alpha_h, alpha_v, alpha_d) from flat-difference
    nearest-neighbor autocorrelations.

    For shot noise passed through a small symmetric kernel K,
    C(d)/C(0) ~ 2 alpha_d to first order; returns scalar alphas
    (solid-waffle reports superpixel averages; the correlation method
    is intrinsically an average).
    """
    flat_cube = np.asarray(flat_cube, np.float64)
    diffs = flat_cube[1:] - flat_cube[:-1]
    nb = nborder
    d = diffs[:, nb:-nb, nb:-nb]
    d = d - d.mean(axis=(1, 2), keepdims=True)
    c0 = np.mean(d * d)
    ch = np.mean(d[:, :, 1:] * d[:, :, :-1])
    cv = np.mean(d[:, 1:, :] * d[:, :-1, :])
    cd = 0.5 * (
        np.mean(d[:, 1:, 1:] * d[:, :-1, :-1])
        + np.mean(d[:, 1:, :-1] * d[:, :-1, 1:])
    )
    return {
        "alphaH": float(ch / (2.0 * c0)),
        "alphaV": float(cv / (2.0 * c0)),
        "alphaD": float(cd / (2.0 * c0)),
    }
