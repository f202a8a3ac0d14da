"""Monte-Carlo moment tests for the Pearson-family samplers.

Same parameter regimes and gates as the reference
(``tests/romanimpreprocess/test_pearson.py``): 100k draws per type,
2nd-moment relative error < 0.2, plus 3rd-moment sign checks and a
wall-clock guard far below the reference's 100 s scalar-loop budget
(ours is vectorized).
"""

import time

import numpy as np
import pytest

from romanimpreprocess_tpu.galpoisson import draw_from_pearson, get_tilde_nus
from romanimpreprocess_tpu.galpoisson.pearson import (
    _ar_batched,
    _betas,
    _devroye_acc_rate,
    _draw_type1,
    _draw_type3,
    _draw_type4,
    _draw_type5,
    _draw_type6,
    _type4_params,
)

NSAMP = 100_000


def _check(draws, tilnu_21, tilnu_31, I, rtol=0.2):
    mu2_t = tilnu_21 * I
    mu2 = draws.var(ddof=0)
    assert abs(mu2 - mu2_t) / mu2_t < rtol, (mu2, mu2_t)
    # 3rd-moment sign, only when the target skew clears the MC noise
    # floor (std of the mu3 estimator ~ sqrt(15) sigma^3 / sqrt(n))
    mu3_t = tilnu_31 * I
    mc_noise = np.sqrt(15.0 / len(draws)) * mu2_t**1.5
    if abs(mu3_t) > 5 * mc_noise:
        mu3 = np.mean((draws - draws.mean()) ** 3)
        assert np.sign(mu3) == np.sign(tilnu_31)
    assert abs(draws.mean()) < 5 * np.sqrt(mu2_t / len(draws)) * 3


def test_type1_moments():
    rng = np.random.default_rng(1)
    I = np.full(NSAMP, 2.0)
    d = _draw_type1(1.4375, -0.5, 0.15, I, rng)
    _check(d, 1.4375, -0.5, 2.0)


def test_type3_moments():
    rng = np.random.default_rng(2)
    I = np.full(NSAMP, 2.0)
    d = _draw_type3(1.4375, -0.5, I, rng)
    _check(d, 1.4375, -0.5, 2.0)


def test_type4_devroye_moments_and_speed():
    rng = np.random.default_rng(3)
    I = np.full(NSAMP, 3.0)
    m, nu, a, lam = _type4_params(1.0, -1.0, 10.0, I)
    assert np.all(_devroye_acc_rate(m, nu, a) > 0.005)  # Devroye regime
    t0 = time.monotonic()
    d = _draw_type4(1.0, -1.0, 10.0, I, rng)
    dt = time.monotonic() - t0
    _check(d, 1.0, -1.0, 3.0)
    assert dt < 30.0  # reference scalar-loop guard is 100 s


def test_type4_ar_moments():
    rng = np.random.default_rng(4)
    n = 20_000
    I = np.full(n, 50.0)
    d = _draw_type4(5.0, -1.0, 5.0, I, rng)
    _check(d, 5.0, -1.0, 50.0)


def test_type4_ar_reports_stragglers():
    """_ar_batched with max_rounds=0 must report every lane pending
    (not silently write zeros) so the caller can apply its
    moment-matched fallback."""
    rng = np.random.default_rng(7)
    I = np.full(64, 50.0)
    m, nu, a, lam = _type4_params(5.0, -1.0, 5.0, I)
    out, pending = _ar_batched(m, nu, a, lam, rng, max_rounds=0)
    assert pending.all()
    assert np.all(out == 0.0)


def test_type4_straggler_fallback_matches_variance(monkeypatch):
    """If both type-4 samplers leave lanes pending, the fallback must
    draw moment-matched normals (mu2 = t21 * I), not inject zeros."""
    from romanimpreprocess_tpu.galpoisson import pearson as P

    def all_pending_ar(m, nu, a, lam, rng, max_rounds=10000):
        return np.zeros(m.shape[0]), np.ones(m.shape[0], bool)

    def all_pending_dev(m, nu, a, lam, rng):
        return np.zeros(m.shape[0]), np.ones(m.shape[0], bool)

    monkeypatch.setattr(P, "_ar_batched", all_pending_ar)
    monkeypatch.setattr(P, "_devroye_batched", all_pending_dev)
    rng = np.random.default_rng(8)
    t21, t31, t41, I0 = 1.0, -1.0, 10.0, 3.0
    d = P._draw_type4(t21, t31, t41, np.full(NSAMP, I0), rng)
    assert np.isfinite(d).all()
    mu2 = t21 * I0
    assert abs(d.var(ddof=0) - mu2) / mu2 < 0.05
    assert abs(d.mean()) < 3 * np.sqrt(mu2 / NSAMP) * 4


def test_type5_moments():
    rng = np.random.default_rng(5)
    I = np.full(NSAMP, 120.0)
    d = _draw_type5(7.0, -0.5, I, rng)
    _check(d, 7.0, -0.5, 120.0)


def test_type6_moments():
    rng = np.random.default_rng(6)
    I = np.full(NSAMP, 3.5)
    d = _draw_type6(6.0, -1.0, 0.3, I, rng)
    _check(d, 6.0, -1.0, 3.5)


def test_dispatcher_mixed_intensities():
    """The dispatcher covers a wide intensity range in one call and the
    per-pixel variance tracks tilnu_21 * I."""
    rng = np.random.default_rng(7)
    tilnus = (1.4375, -0.5, 0.15)
    nrep, nI = 4000, 12
    I = np.geomspace(0.5, 500.0, nI)
    II = np.broadcast_to(I, (nrep, nI)).copy()
    d = draw_from_pearson(*tilnus, II, rng=rng)
    var = d.var(axis=0, ddof=0)
    target = tilnus[0] * I
    ok = np.abs(var / target - 1) < 0.3
    assert ok.mean() > 0.9, (var, target)


def test_dispatcher_inadmissible_returns_zero():
    d = draw_from_pearson(1.0, 0.0, -10.0, np.full(10, 1e-6))
    assert np.all(d == 0)


def test_tilde_nus_against_o4_construction():
    """Cross-check the O(N^2) cumulative-sum tilde-nus against a direct
    O(N^4)-style central-moment construction on a small case (the
    reference's denoise_construct is the pedagogical equivalent)."""
    N_beta = np.array([1, 2, 4, 4, 4, 1])
    a_beta = np.array([2, 3, 5, 23, 44, 49])
    W = np.array([-0.1, -0.4, -0.2, 0.2, 0.4, 0.1])
    t21, t31, t41, t42 = get_tilde_nus(N_beta, a_beta, W)
    # the tilde's are the debias combinations of the raw cumulant
    # coefficients nu_p1 = sum (W T)^p (eq. 32 of the noise-bias paper):
    nu21 = t21
    nu31 = t31 + 3 * nu21**2
    assert np.isclose(t42, 3 * nu21**2)
    # Monte-Carlo check of nu21/nu31: unit-rate Poisson ramps -> the
    # weighted statistic's variance and 3rd central moment are
    # nu21 * rate and nu31 * rate
    rng = np.random.default_rng(11)
    nmc = 400_000
    rate = 3.0
    nreads = int(np.max(a_beta + N_beta))
    incs = rng.poisson(rate, size=(nmc, nreads))
    incs[:, 0] = 0  # no charge before the first read
    cum = np.cumsum(incs, axis=1)
    res = np.stack(
        [cum[:, a : a + n].mean(axis=1) for a, n in zip(a_beta, N_beta)],
        axis=1,
    )
    xi = res @ W
    mu2 = xi.var(ddof=0)
    mu3 = np.mean((xi - xi.mean()) ** 3)
    assert abs(mu2 - nu21 * rate) / (nu21 * rate) < 0.02
    assert abs(mu3 - nu31 * rate) / abs(nu31 * rate) < 0.25
