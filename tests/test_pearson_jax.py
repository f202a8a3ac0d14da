"""Moment tests for the on-device (JAX) Pearson samplers.

Same parameter regimes and envelopes as ``tests/test_pearson.py`` (the
host backend), which mirror the reference's
``tests/romanimpreprocess/test_pearson.py`` gates, plus host-vs-device
cross-backend variance agreement and a compacted-buffer path check.
"""

import numpy as np
import pytest

import jax

from romanimpreprocess_tpu.galpoisson import draw_from_pearson
from romanimpreprocess_tpu.galpoisson.pearson import (
    _betas,
    _devroye_acc_rate,
    _type4_params,
)
from romanimpreprocess_tpu.galpoisson.pearson_jax import (
    draw_from_pearson_jax,
)

NSAMP = 100_000


def _check(draws, tilnu_21, tilnu_31, I, rtol=0.2):
    draws = np.asarray(draws, np.float64)
    mu2_t = tilnu_21 * I
    mu2 = draws.var(ddof=0)
    assert abs(mu2 - mu2_t) / mu2_t < rtol, (mu2, mu2_t)
    mu3_t = tilnu_31 * I
    mc_noise = np.sqrt(15.0 / len(draws)) * mu2_t**1.5
    if abs(mu3_t) > 5 * mc_noise:
        mu3 = np.mean((draws - draws.mean()) ** 3)
        assert np.sign(mu3) == np.sign(tilnu_31)
    assert abs(draws.mean()) < 5 * np.sqrt(mu2_t / len(draws)) * 3


def _draw(seed, t21, t31, t41, I, **kw):
    key = jax.random.key(seed)
    return draw_from_pearson_jax(key, t21, t31, t41, I, **kw)


def _dominant_type(t21, t31, t41, I0):
    beta1, beta2 = _betas(t21, t31, t41, np.asarray([I0], float))
    rhs1 = 1.5 * beta1 + 3.0
    rhs2 = (48.0 + 39.0 * beta1 + 6.0 * (4.0 + beta1) ** 1.5) / (
        32.0 - beta1
    )
    if beta2 < rhs1:
        return 1
    if beta2 < rhs2:
        return 6
    return 4


def test_type1_moments_jax():
    t = (1.4375, -0.5, 0.15)
    assert _dominant_type(*t, 2.0) == 1
    d = _draw(1, *t, np.full(NSAMP, 2.0))
    _check(d, t[0], t[1], 2.0)


def test_type6_moments_jax():
    t = (6.0, -1.0, 0.3)
    assert _dominant_type(*t, 3.5) == 6
    d = _draw(6, *t, np.full(NSAMP, 3.5))
    _check(d, t[0], t[1], 3.5)


def test_type4_devroye_moments_jax():
    t = (1.0, -1.0, 10.0)
    assert _dominant_type(*t, 3.0) == 4
    I = np.full(NSAMP, 3.0)
    m, nu, a, lam = _type4_params(*t, I)
    assert np.all(_devroye_acc_rate(m, nu, a) > 0.02)  # Devroye route
    assert np.all(m < 256.0)  # exact-rejection regime (not CF)
    d = _draw(3, *t, I)
    _check(d, t[0], t[1], 3.0)


def test_type4_ar_route_moments_jax():
    """Parameters whose predicted Devroye acceptance is below the
    routing threshold exercise the mixture accept-reject branch."""
    t = (1.0, -1.089, 2.5)
    I = np.full(20_000, 50.0)
    m, nu, a, lam = _type4_params(*t, I)
    acc = _devroye_acc_rate(m, nu, a)
    assert np.all(m < 256.0)
    assert np.all(acc < 0.02)  # below ACC_AR_CUT: AR route
    d = _draw(4, *t, I)
    _check(d, t[0], t[1], 50.0)


def test_type4_cf_path_matches_host_variance():
    """Large-m (near-Gaussian) type-4 lanes take the Cornish-Fisher
    path; 2nd moment is exact by construction and 3rd-moment sign
    holds."""
    t21, t31, t41 = 1.0, -0.05, 0.5
    I = np.full(NSAMP, 2000.0)
    m, nu, a, lam = _type4_params(t21, t31, t41, I)
    assert np.all(m > 256.0)  # CF regime
    assert _dominant_type(t21, t31, t41, 2000.0) == 4
    d = _draw(5, t21, t31, t41, I)
    _check(d, t21, t31, 2000.0, rtol=0.05)
    mu4 = np.mean((np.asarray(d) - np.mean(d)) ** 4)
    mu2_t = t21 * 2000.0
    beta2_t = (3 * t21**2 * 2000.0 + t41) / (t21**2 * 2000.0)
    assert abs(mu4 / mu2_t**2 - beta2_t) < 0.1


def test_compacted_buffer_path():
    """n > rej_buf forces the cumsum-compaction + scan-chunk path."""
    t = (1.0, -1.0, 10.0)
    n = 10_000
    d = _draw(7, *t, np.full(n, 3.0), rej_buf=1024)
    _check(d, t[0], t[1], 3.0, rtol=0.3)


def test_straggler_fallback_is_finite():
    """max_rounds=1 leaves most rejection lanes pending; the CF
    fallback must keep the draw finite and variance-sane."""
    t = (1.0, -1.0, 10.0)
    d = np.asarray(_draw(8, *t, np.full(50_000, 3.0), max_rounds=1))
    assert np.isfinite(d).all()
    _check(d, t[0], t[1], 3.0, rtol=0.3)


def test_dispatcher_mixed_intensities_jax():
    t = (1.4375, -0.5, 0.15)
    nrep, nI = 4000, 12
    I = np.geomspace(0.5, 500.0, nI)
    II = np.broadcast_to(I, (nrep, nI)).copy()
    d = np.asarray(_draw(9, *t, II), np.float64)
    var = d.var(axis=0, ddof=0)
    target = t[0] * I
    ok = np.abs(var / target - 1) < 0.3
    assert ok.mean() > 0.9, (var, target)


def test_inadmissible_draws_zero_jax():
    d = np.asarray(_draw(10, 1.0, 0.0, -10.0, np.full(10, 1e-6)))
    assert np.all(d == 0)


def test_per_pixel_tilnu_maps():
    """tilnu maps varying per pixel (the fused multi-endslice 'O'
    layer): each class's variance tracks its own t21 * I."""
    n = 40_000
    t21 = np.where(np.arange(n) % 2 == 0, 1.4375, 0.7)
    t31 = np.where(np.arange(n) % 2 == 0, -0.5, -0.25)
    t41 = np.where(np.arange(n) % 2 == 0, 0.15, 0.08)
    I = np.full(n, 4.0)
    d = np.asarray(_draw(11, t21, t31, t41, I), np.float64)
    for sel, t in ((np.arange(n) % 2 == 0, 1.4375), (np.arange(n) % 2 == 1, 0.7)):
        v = d[sel].var(ddof=0)
        assert abs(v - t * 4.0) / (t * 4.0) < 0.15, (v, t * 4.0)


@pytest.mark.parametrize(
    "t,I0",
    [
        ((1.4375, -0.5, 0.15), 2.0),   # type 1
        ((6.0, -1.0, 0.3), 3.5),       # type 6
        ((1.0, -1.0, 10.0), 3.0),      # type 4 (Devroye)
    ],
)
def test_cross_backend_variance_agreement(t, I0):
    """Host and device backends agree on the 2nd moment to MC noise."""
    n = 60_000
    I = np.full(n, I0)
    rng = np.random.default_rng(42)
    d_host = draw_from_pearson(*t, I, rng=rng)
    d_dev = np.asarray(_draw(12, *t, I), np.float64)
    vh, vd = d_host.var(ddof=0), d_dev.var(ddof=0)
    assert abs(vh - vd) / vh < 0.1, (vh, vd)
