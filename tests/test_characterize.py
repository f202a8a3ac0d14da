"""Detector-characterization tests: recover a known detector model.

Flat ramps are forward-modeled through the synthetic linearity/gain/IPC
model (the framework's own inverse-linearity), then the characterization
fits must recover the response curve, gain, and IPC alphas.
"""

import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu.calib import characterize
from romanimpreprocess_tpu.ops import ipc, linearity

rng = np.random.RandomState(42)
N = 64


def _toy_linearity():
    x, y = np.meshgrid(np.arange(N), np.arange(N))
    Smin = np.full((N, N), 4000.0, np.float32)
    Smax = (56000 + 2000 * rng.uniform(size=(N, N))).astype(np.float32)
    Sref = (Smin + 1000).astype(np.float32)
    data = np.zeros((4, N, N), np.float32)
    data[2] = 100 + 80 * rng.uniform(size=(N, N))
    z = 2 * (Sref - Smin) / (Smax - Smin) - 1
    data[1] = (Smax - Smin) / 2.0 - 3 * data[2] * z
    data[0] = -data[1] * z - data[2] * (1.5 * z**2 - 0.5)
    return linearity.LinearityData(
        jnp.asarray(data), jnp.asarray(Smin), jnp.asarray(Smax),
        jnp.asarray(Sref), jnp.zeros((N, N), jnp.uint32),
    )


def test_fit_linearity_recovers_response():
    lin = _toy_linearity()
    # two flat ramps at different fluxes, forward-modeled S = L^-1(a t)
    rates = [900.0, 200.0]
    t_hi = np.arange(1, 16) * 3.04
    t_lo = np.arange(1, 21) * 3.04
    ramps = []
    for a, ts in zip(rates, (t_hi, t_lo)):
        frames = []
        for t in ts:
            slin = jnp.full((N, N), a * t, jnp.float32)
            s, _ = linearity.invert_linearity(slin, lin)
            frames.append(np.asarray(s))
        ramps.append(np.stack(frames).astype(np.float32))
    sref_frame = np.asarray(
        linearity.invert_linearity(jnp.zeros((N, N)), lin)[0]
    )

    fit = characterize.fit_linearity(
        ramps, [t_hi, t_lo], sref_frame, p_order=5, n_iter=5
    )
    fitted = linearity.LinearityData(
        jnp.asarray(fit["data"]), jnp.asarray(fit["Smin"]),
        jnp.asarray(fit["Smax"]), jnp.asarray(fit["Sref"]),
        jnp.asarray(fit["dq"]),
    )

    # compare linearized outputs over the sampled raw-DN range
    max_s = ramps[0][-1]
    rel_errs = []
    for frac in (0.15, 0.4, 0.7, 0.95):
        S = (sref_frame + frac * (max_s - sref_frame)).astype(np.float32)
        want, _ = linearity.apply_linearity(jnp.asarray(S), lin)
        got, _ = linearity.apply_linearity(jnp.asarray(S), fitted)
        # gauge: both are 0 at Sref with unit derivative -> directly
        # comparable
        w = np.asarray(want)
        g = np.asarray(got)
        rel = np.median(np.abs(g - w) / np.maximum(np.abs(w), 100.0))
        rel_errs.append(rel)
    assert max(rel_errs) < 0.03, rel_errs


def test_gain_from_mean_variance():
    g_true = 1.5
    nframes = 60
    rate_e = 2000.0  # e/frame
    cum = np.cumsum(
        rng.poisson(rate_e, size=(nframes, N, N)), axis=0
    ) / g_true
    gain = characterize.gain_from_mean_variance(
        cum.astype(np.float32), superpixel=16
    )
    assert abs(np.median(gain) - g_true) / g_true < 0.1, np.median(gain)


def test_ipc_from_autocorr():
    aH, aV, aD = 0.015, 0.012, 0.002
    K = np.zeros((3, 3, N, N), np.float32)
    K[1, 0] = K[1, 2] = aH
    K[0, 1] = K[2, 1] = aV
    K[0, 0] = K[0, 2] = K[2, 0] = K[2, 2] = aD
    K[1, 1] = 1 - K.sum(axis=(0, 1)) + K[1, 1]
    nframes = 40
    rate_e = 5000.0
    incs = rng.poisson(rate_e, size=(nframes, N, N)).astype(np.float32)
    cum = np.cumsum(incs, axis=0)
    conv = np.stack(
        [np.asarray(ipc.ipc_fwd(jnp.asarray(c), jnp.asarray(K))) for c in cum]
    )
    alphas = characterize.ipc_from_autocorr(conv, nborder=2)
    assert abs(alphas["alphaH"] - aH) < 0.004, alphas
    assert abs(alphas["alphaV"] - aV) < 0.004, alphas
    assert abs(alphas["alphaD"] - aD) < 0.002, alphas
