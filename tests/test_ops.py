"""Unit tests for the device kernel library vs independent numpy oracles.

Mirrors the reference's kernel-level test strategy
(``tests/romanimpreprocess/test_linutils.py``, ``test_ref.py``) but with
oracles written from the documented formulas rather than imports.
"""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.polynomial import legendre as npleg

from romanimpreprocess_tpu.ops import (
    ipc,
    legendre,
    linearity,
    mask,
    pink,
    refsub,
    saturation,
    sky,
)

rng = np.random.RandomState(7)


def test_legendre_matches_numpy():
    z = rng.uniform(-1.4, 1.4, (5, 6)).astype(np.float32)
    coefs = rng.normal(size=(4, 5, 6)).astype(np.float32)
    phi, ex = legendre.legendre_eval(jnp.array(z), jnp.array(coefs), linextrap=False)
    ref = np.zeros_like(z)
    for L in range(4):
        ref += coefs[L] * npleg.legval(z, [0] * L + [1])
    assert np.allclose(phi, ref, atol=1e-4)

    phi2, ex2 = legendre.legendre_eval(jnp.array(z), jnp.array(coefs))
    assert np.array_equal(np.array(ex2), np.abs(z) > 1)
    # tangent-line continuation beyond |z|=1
    expected = np.zeros_like(z)
    for L in range(4):
        PL = np.sign(z) ** L * (1 + L * (L + 1) / 2 * (np.abs(z) - 1)) if L else 1.0
        expected += coefs[L] * PL
    out = np.abs(z) > 1
    assert np.allclose(np.where(out, phi2, 0), np.where(out, expected, 0), atol=1e-4)


def test_ipc_fwd_oracle_and_inverse():
    ny, nx = 8, 9
    im = rng.normal(size=(ny, nx)).astype(np.float32)
    K = rng.uniform(0, 0.02, (3, 3, ny, nx)).astype(np.float32)
    K[1, 1] = 1 - K.sum(axis=(0, 1)) + K[1, 1]
    out = np.array(ipc.ipc_fwd(jnp.array(im), jnp.array(K)))
    oracle = np.zeros_like(im)
    for y in range(ny):
        for x in range(nx):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ys, xs = y - dy, x - dx
                    if 0 <= ys < ny and 0 <= xs < nx:
                        oracle[y, x] += im[ys, xs] * K[1 + dy, 1 + dx, ys, xs]
    assert np.allclose(out, oracle, atol=1e-5)

    rev = np.array(ipc.ipc_rev(jnp.array(out), jnp.array(K), order=4))
    assert np.allclose(rev, im, atol=1e-4)

    g = rng.uniform(1.4, 1.6, (ny, nx)).astype(np.float32)
    outg = ipc.ipc_fwd(jnp.array(im), jnp.array(K), gain=jnp.array(g))
    revg = np.array(ipc.ipc_rev(outg, jnp.array(K), order=4, gain=jnp.array(g)))
    assert np.allclose(revg, im, atol=1e-4)


def _toy_linearity(N):
    """gencal-style cubic Legendre linearity with unit slope at Sref."""
    x, y = np.meshgrid(np.arange(N), np.arange(N))
    Smin = (5000 + 500 * np.cos((x + 3 * y) / 100.0)).astype(np.float32)
    Smax = (56000 + 10000 * rng.uniform(size=(N, N))).astype(np.float32)
    Sref = (Smin + 300 + 100 * (x % 2)).astype(np.float32)
    data = np.zeros((4, N, N), np.float32)
    data[2] = 20 + 180 * rng.uniform(size=(N, N))
    zr = 2 * (Sref - Smin) / (Smax - Smin) - 1
    data[1] = (Smax - Smin) / 2 - 3 * data[2] * zr
    data[0] = -data[1] * zr - data[2] * (1.5 * zr**2 - 0.5)
    return linearity.LinearityData(
        jnp.array(data), jnp.array(Smin), jnp.array(Smax), jnp.array(Sref),
        jnp.zeros((N, N), jnp.uint32),
    )


def test_linearity_forward_backward():
    """Round trip within 0.01 DN (reference gate: 0.002 DN at f64; we run
    the bisection in f32)."""
    N = 16
    lin = _toy_linearity(N)
    S = np.array(lin.sref) + 5000.0 * rng.uniform(size=(N, N)).astype(np.float32)
    Slin, _ = linearity.apply_linearity(jnp.array(S), lin)
    Sback, exf = linearity.invert_linearity(Slin, lin)
    assert np.abs(np.array(Sback) - S).max() < 0.01
    assert not np.any(np.array(exf))


def test_multilin_fallback_and_first_group_clip():
    N = 16
    lin = _toy_linearity(N)
    dqcal = np.zeros((N, N), np.uint32)
    dqcal[0, 0] = 2**20  # NO_LIN_CORR -> fallback to S - Sref
    lin2 = lin._replace(dq=jnp.array(dqcal))
    Sref = np.array(lin.sref)
    S = Sref + 5000.0 * rng.uniform(size=(N, N)).astype(np.float32)
    cube = np.stack([Sref - 3000, S, S + 2000]).astype(np.float32)
    phic, dqc = linearity.apply_linearity_cube(jnp.array(cube), lin2)
    assert np.allclose(np.array(phic)[:, 0, 0], cube[:, 0, 0] - Sref[0, 0], atol=1e-3)
    # group 0 out of range must NOT be flagged (do_not_flag_first)
    assert not np.any(np.array(dqc)[1:, 1:] & 2**20)


def test_refsub_row_removes_banding():
    img = np.zeros((64, 64 + 8), np.float32)
    rowsig = rng.normal(size=64).astype(np.float32) * 5
    img += rowsig[:, None]
    out = np.array(
        refsub.ref_subtraction_row(
            jnp.array(img), nside=64, nborder=4, channelwidth=8, use_ref_channel=True
        )
    )
    assert out[:, :64].std() < img[:, :64].std() * 0.05


def test_refsub_channel_removes_gradient():
    img = np.zeros((64, 64), np.float32) + np.linspace(0, 10, 64)[:, None]
    out = np.array(
        refsub.ref_subtraction_channel(jnp.array(img), nside=64, nborder=4, channelwidth=8)
    )
    assert np.abs(out).max() < 0.5


def test_medfit_recovers_legendre_sky():
    ny = nx = 256
    uu = np.linspace(-1, 1 - 2 / nx, nx)
    U, V = np.meshgrid(uu, uu)
    c = [1.0, 0.3, -0.2, 0.15, 0.05, -0.1]  # (i,j) ordering of the reference
    img = (
        c[0] + c[1] * V + c[2] * (1.5 * V**2 - 0.5) + c[3] * U + c[4] * U * V
        + c[5] * (1.5 * U**2 - 0.5)
    ).astype(np.float32)
    coef, model = sky.medfit(jnp.array(img), N=8, order=2)
    assert np.allclose(np.array(coef), c, atol=2e-3)
    assert np.allclose(np.array(model), img, atol=5e-3)
    # reconstruction helper matches
    rec = sky.sky_model_from_coefs(np.array(coef), ny, nx, 2)
    assert np.allclose(rec, model, atol=1e-4)


def test_smooth_mode_finds_peak_with_nans():
    arr = rng.normal(3.0, 0.5, (200, 200)).astype(np.float32)
    arr[:20, :20] = np.nan
    md, w = sky.smooth_mode(jnp.array(arr))
    assert abs(float(md) - 3.0) < 0.05


def test_mask_grow_shapes():
    dq = np.zeros((16, 16), np.uint32)
    dq[8, 8] = 4  # JUMP_DET -> cross grow (5)
    m = np.array(mask.PixelMask1.build(jnp.array(dq)))
    assert m.sum() == 5 and m[8, 8] and m[7, 8] and m[8, 9]
    dq2 = np.zeros((16, 16), np.uint32)
    dq2[8, 8] = 2**10  # DEAD -> 3x3 (9)
    assert np.array(mask.PixelMask1.build(jnp.array(dq2))).sum() == 9
    dq3 = np.zeros((16, 16), np.uint32)
    dq3[8, 8] = 2**3  # DROPOUT -> 5x5 (25)
    assert np.array(mask.PixelMask1.build(jnp.array(dq3))).sum() == 25


def test_pink_noise_spectrum():
    blocks = jax.jit(pink.pink_frames, static_argnums=(1, 2, 3))(
        jax.random.PRNGKey(0), 4, 64, 8
    )
    flat = np.array(blocks).reshape(4, -1)
    assert np.allclose(flat.mean(axis=1), 0, atol=1e-4)
    ps = np.abs(np.fft.rfft(flat, axis=1)) ** 2
    f = np.fft.rfftfreq(flat.shape[1])
    lo = ps[:, (f > 0.001) & (f < 0.01)].mean()
    hi = ps[:, (f > 0.1) & (f < 0.5)].mean()
    assert 5 < lo / hi < 500  # ~1/f spectral slope


def test_saturation_flags():
    ngrp = 6
    data = np.zeros((ngrp, 12, 12), np.float32)
    data[:, 5, 5] = [10, 10, 10, 2000, 3000, 4000]  # saturates at group 3
    data[:, 2, 2] = [10, 10, 10, 10, 10, -1]  # A/D floor at group 5
    thr = np.full((12, 12), 1000, np.float32)
    rdq2, pdq2 = saturation.flag_saturation(
        jnp.array(data),
        jnp.zeros((ngrp, 12, 12), jnp.uint32),
        jnp.zeros((12, 12), jnp.uint32),
        jnp.array(thr),
        jnp.zeros((12, 12), jnp.uint32),
        backup=1, skip_first=1, n_pix_grow_sat=1,
    )
    rdq2 = np.array(rdq2)
    assert rdq2[3, 5, 5] & 2 and rdq2[4, 5, 5] & 2 and rdq2[5, 5, 5] & 2
    assert rdq2[2, 5, 5] & 2  # backup retro-flag
    assert not rdq2[1, 5, 5] & 2
    assert rdq2[3, 5, 6] & 2 and rdq2[3, 6, 6] & 2  # spatial grow
    assert rdq2[5, 2, 2] & (64 | 1)  # AD_FLOOR | DO_NOT_USE


def test_saturation_backup2_exact_width():
    """backup=2 must retro-flag exactly the TWO groups before first
    saturation (the pre-fix loop shifted its own output, compounding to
    2**backup - 1 = 3 groups and silently over-truncating bright
    ramps)."""
    ngrp = 8
    data = np.zeros((ngrp, 8, 8), np.float32)
    data[:, 4, 4] = [0, 0, 0, 0, 0, 0, 2000, 3000]  # saturates at group 6
    rdq2, _ = saturation.flag_saturation(
        jnp.array(data),
        jnp.zeros((ngrp, 8, 8), jnp.uint32),
        jnp.zeros((8, 8), jnp.uint32),
        jnp.full((8, 8), 1000, jnp.float32),
        jnp.zeros((8, 8), jnp.uint32),
        backup=2, skip_first=1, n_pix_grow_sat=0,
    )
    sat = (np.array(rdq2)[:, 4, 4] & 2) != 0
    assert list(sat) == [False, False, False, False,
                         True, True, True, True]


def test_saturation_no_sat_check():
    data = np.full((3, 8, 8), 5000, np.float32)
    satdq = np.zeros((8, 8), np.uint32)
    satdq[4, 4] = 2**21  # NO_SAT_CHECK
    rdq2, pdq2 = saturation.flag_saturation(
        jnp.array(data),
        jnp.zeros((3, 8, 8), jnp.uint32),
        jnp.zeros((8, 8), jnp.uint32),
        jnp.full((8, 8), 1000, jnp.float32),
        jnp.array(satdq),
        backup=0, skip_first=0, n_pix_grow_sat=0,
    )
    assert not np.array(rdq2)[2, 4, 4] & 2
    assert np.array(pdq2)[4, 4] & 2**21


def test_block_nanmedian_bit_exact():
    """The bit-bisection block median is bit-identical to numpy
    nanmedian (odd/even counts, NaNs, negatives, all-NaN blocks)."""
    import warnings

    r = np.random.RandomState(0)
    for ny, N in [(256, 8), (240, 8), (129, 3)]:
        arr = r.normal(0, 10, (ny, ny)).astype(np.float32)
        arr[r.uniform(size=(ny, ny)) < 0.1] = np.nan
        got = np.asarray(sky.block_nanmedian(jnp.asarray(arr), N))
        ky = ny // N
        py = (ny % N) // 2
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = np.nanmedian(
                arr[py : py + N * ky, py : py + N * ky].reshape(N, ky, N, ky),
                axis=(1, 3),
            )
        assert np.array_equal(got, want, equal_nan=True)
    arr = np.full((16, 16), np.nan, np.float32)
    arr[8:, :] = -r.uniform(1, 5, (8, 16)).astype(np.float32)
    got = np.asarray(sky.block_nanmedian(jnp.asarray(arr), 2))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = np.nanmedian(arr.reshape(2, 8, 2, 8), axis=(1, 3))
    assert np.array_equal(got, want, equal_nan=True)


def test_custom_poisson_distribution():
    """The fixed-trip-count Poisson sampler matches the exact pmf
    (chi-square) across the small/PTRS regimes."""
    from scipy import stats

    from romanimpreprocess_tpu.ops import rand

    for lam in (0.5, 5.0, 30.0, 900.0):
        n = 200_000
        x = np.asarray(
            rand.poisson(jax.random.PRNGKey(int(lam) + 3), jnp.full((n,), lam))
        )
        assert (x >= 0).all()
        ks = np.arange(
            max(0, int(lam - 6 * np.sqrt(lam))), int(lam + 6 * np.sqrt(lam)) + 2
        )
        pmf = stats.poisson.pmf(ks, lam)
        sel = pmf * n > 10
        obs = np.array([(x == k).sum() for k in ks[sel]])
        exp = pmf[sel] * n
        chi2 = ((obs - exp) ** 2 / exp).sum() / max(sel.sum() - 1, 1)
        assert chi2 < 2.5, (lam, chi2)


def test_custom_poisson_chunked(monkeypatch):
    """The leading-axis-chunked path (large draws) matches moments and
    draws distinct slices per leading index."""
    from romanimpreprocess_tpu.ops import rand

    monkeypatch.setattr(rand, "CHUNK_ELEMS", 1000)
    key = jax.random.PRNGKey(11)
    # broadcast-lam path (the sim accumulator's shape pattern)
    lam = jnp.full((64, 63), 4.0)
    x = np.asarray(rand.poisson(key, lam, shape=(6, 64, 63)))
    assert x.shape == (6, 64, 63)
    assert not np.array_equal(x[0], x[1])
    m = x.mean()
    assert abs(m - 4.0) < 0.05, m
    assert abs(x.var() - 4.0) < 0.1
    # full-lam path (per-slice rates vary)
    lam3 = jnp.stack([jnp.full((64, 63), v) for v in (1.0, 50.0, 300.0)])
    y = np.asarray(rand.poisson(jax.random.PRNGKey(12), lam3))
    for i, v in enumerate((1.0, 50.0, 300.0)):
        assert abs(y[i].mean() - v) < 4 * np.sqrt(v / (64 * 63)) + 0.05


def test_custom_gamma_beta_t_distributions():
    """Fixed-round Gamma/Beta/Student-t samplers match scipy
    distributions (chi-square on quantile bins) across shape regimes —
    incl. alpha < 1 (boost identity path)."""
    from scipy import stats

    from romanimpreprocess_tpu.ops import rand

    n = 200_000
    edges = np.linspace(0.01, 0.99, 25)

    def chi2_of(x, dist):
        qs = dist.ppf(edges)
        obs, _ = np.histogram(x, bins=qs)
        p = np.diff(edges)
        exp = p * len(x)
        return ((obs - exp) ** 2 / exp).sum() / (len(exp) - 1)

    for alpha in (0.3, 0.9, 1.0, 3.7, 40.0, 900.0):
        x = np.asarray(
            rand.gamma(
                jax.random.PRNGKey(int(alpha * 10)),
                jnp.full((n,), alpha, jnp.float32),
            ),
            np.float64,
        )
        assert (x > 0).all()
        c = chi2_of(x, stats.gamma(alpha))
        assert c < 2.5, (alpha, c)

    for a, b in ((0.5, 0.5), (2.0, 5.0), (50.0, 30.0)):
        x = np.asarray(
            rand.beta(
                jax.random.PRNGKey(7),
                jnp.full((n,), a, jnp.float32),
                jnp.full((n,), b, jnp.float32),
            ),
            np.float64,
        )
        c = chi2_of(x, stats.beta(a, b))
        assert c < 2.5, (a, b, c)

    for df in (3.0, 29.0, 400.0):
        x = np.asarray(
            rand.student_t(
                jax.random.PRNGKey(9), jnp.full((n,), df, jnp.float32)
            ),
            np.float64,
        )
        c = chi2_of(x, stats.t(df))
        assert c < 2.5, (df, c)


def test_bisect_quantiles_matches_percentile():
    from romanimpreprocess_tpu.ops import sky as skymod

    rng = np.random.RandomState(5)
    for x in (
        rng.normal(3.0, 2.0, (500, 400)).astype(np.float32),
        rng.exponential(1.0, (1000,)).astype(np.float32),
    ):
        got = np.asarray(
            jax.jit(
                lambda a: skymod.bisect_quantiles(a, (0.25, 0.5, 0.75))
            )(jnp.asarray(x))
        )
        # bisection converges to the inverted-CDF order statistic
        # (smallest v with count(<=v) >= q*n); at production sizes the
        # gap to interpolated percentiles is O(1/(n*density)) ~ 1e-7
        srt = np.sort(x.ravel())
        n = srt.size
        want = np.array(
            [srt[min(int(np.ceil(q * n)) - 1, n - 1)]
             for q in (0.25, 0.5, 0.75)]
        )
        span = x.max() - x.min()
        assert np.all(np.abs(got - want) < 2e-6 * span + 1e-5), (got, want)
        # and the interpolated percentile agrees to the local spacing
        assert np.all(
            np.abs(got - np.percentile(x, [25, 50, 75])) < 20.0 / n * span
        )


def test_pink_mxu_matches_irfft_statistics():
    """The MXU Cooley-Tukey pink path matches the exact irfft path in
    variance (<2%) and spectral shape; bf16 rounding adds only a
    sub-percent white perturbation."""
    from romanimpreprocess_tpu.ops import pink as pinkmod

    old = pinkmod.MXU_MIN_LENGTH
    key = jax.random.PRNGKey(3)
    try:
        pinkmod.MXU_MIN_LENGTH = 1 << 30  # force irfft
        a = np.asarray(pinkmod.pink_frames(key, 96, 64, 8), np.float64)
        pinkmod.MXU_MIN_LENGTH = 256  # force MXU path
        b = np.asarray(
            pinkmod.pink_frames(jax.random.PRNGKey(4), 96, 64, 8),
            np.float64,
        )
    finally:
        pinkmod.MXU_MIN_LENGTH = old
    va, vb = a.var(), b.var()
    # independent 96-frame samples of 1/f noise: the k=1 mode carries
    # ~20% of the variance with chi^2_2 scatter, so the sample variance
    # has se ~3% per side — gate at ~3 sigma
    assert abs(vb / va - 1) < 0.12, (va, vb)
    for x in (a, b):
        flat = x.reshape(96, -1)
        ps = np.abs(np.fft.rfft(flat, axis=1)) ** 2
        f = np.fft.rfftfreq(flat.shape[1])
        lo = ps[:, (f > 0.001) & (f < 0.01)].mean()
        hi = ps[:, (f > 0.1) & (f < 0.5)].mean()
        assert 5 < lo / hi < 500
    # spectral ratio agreement between the two backends
    pa = np.abs(np.fft.rfft(a.reshape(96, -1), axis=1)) ** 2
    pb = np.abs(np.fft.rfft(b.reshape(96, -1), axis=1)) ** 2
    f = np.fft.rfftfreq(a.reshape(96, -1).shape[1])
    for flo, fhi in ((0.002, 0.02), (0.02, 0.2), (0.2, 0.5)):
        sel = (f > flo) & (f < fhi)
        r = pb[:, sel].mean() / pa[:, sel].mean()
        assert 0.85 < r < 1.18, (flo, fhi, r)


def test_pink_mxu_paired_frames_independent():
    """The MXU path harvests Re and Im of each transform as two frames;
    they must be empirically independent (the amp-symmetry argument in
    pink.pink_frames) with equal pooled variance.  Single-frame
    statistics of 1/f noise are dominated by the k=1 mode (chi^2_2
    scatter), so the gates pool across many transform pairs."""
    from romanimpreprocess_tpu.ops import pink as pinkmod

    old = pinkmod.MXU_MIN_LENGTH
    try:
        pinkmod.MXU_MIN_LENGTH = 256
        n = 1024  # 512 Re/Im pairs at length 2*16*8 = 256
        x = np.asarray(
            pinkmod.pink_frames(jax.random.PRNGKey(9), n, 16, 8), np.float64
        ).reshape(n, -1)
    finally:
        pinkmod.MXU_MIN_LENGTH = old
    ntr = n // 2
    a, b = x[:ntr], x[ntr:]  # paired: a[j], b[j] share a transform
    # pooled variance equality (se ~ 1%)
    assert abs(a.var() / b.var() - 1) < 0.1, (a.var(), b.var())
    # per-position cross-correlation over the 512 pairs (se ~ 0.044)
    for pos in (0, 31, 64, 100, 127):
        r = np.corrcoef(a[:, pos], b[:, pos])[0, 1]
        assert abs(r) < 0.2, (pos, r)
    # spectral-coefficient independence: same-k Fourier coefficients of
    # paired frames are uncorrelated
    fa = np.fft.rfft(a, axis=1)
    fb = np.fft.rfft(b, axis=1)
    for k in (1, 3, 10, 40):
        r = np.corrcoef(fa[:, k].real, fb[:, k].real)[0, 1]
        assert abs(r) < 0.2, (k, r)


def test_pink_mxu_full_length_spectral_gate():
    """Full production transform length (2*4096*128 = 2^20, n1=n2=1024
    bf16 matmuls): quantized-DFT error must not distort the spectrum.
    Slow on CPU -> opt-in via ROMAN_SLOW=1 or ROMAN_TPU_FULL=1
    (advisor round-2 low finding)."""
    import os

    import pytest

    if os.environ.get("ROMAN_SLOW") != "1" and (
        os.environ.get("ROMAN_TPU_FULL") != "1"
    ):
        pytest.skip("full-length pink gate (set ROMAN_SLOW=1)")
    from romanimpreprocess_tpu.ops import pink as pinkmod

    x = np.asarray(
        jax.jit(pinkmod.pink_frames, static_argnums=(1, 2, 3))(
            jax.random.PRNGKey(11), 4, 4096, 128
        ),
        np.float64,
    ).reshape(4, -1)
    assert x.shape[1] == 4096 * 128
    assert np.isfinite(x).all()
    ps = np.abs(np.fft.rfft(x, axis=1)) ** 2
    f = np.fft.rfftfreq(x.shape[1])
    # analytic: S(f) ~ 1/f -> band-mean power ratio between decades
    # equals the ratio of band-averaged 1/f
    for flo, fhi in ((1e-4, 1e-3), (1e-3, 1e-2), (1e-2, 1e-1)):
        sel_lo = (f > flo) & (f <= fhi)
        sel_hi = (f > flo * 10) & (f <= fhi * 10)
        r = ps[:, sel_lo].mean() / ps[:, sel_hi].mean()
        assert 6.0 < r < 16.0, (flo, r)  # exact 1/f gives ~10
    # bf16 rounding must not inject a white floor: the top-octave power
    # stays far below the bottom-octave power
    top = ps[:, f > 0.25].mean()
    bot = ps[:, (f > 1e-4) & (f < 1e-3)].mean()
    assert top < 0.01 * bot


def test_fill_banding_channel_structure():
    """Inter-channel 1/f banding correlation of the fill core: every
    channel pair shares the common-mode pink frame at c^2/(c^2+u^2) of
    the per-channel variance, with the common component lane-REVERSED
    in odd (reverse-readout) channels (reference
    ``sim_to_isim.py:298-303``).  Guards the flip-common-only
    assembly: reversing only the shared frame (the unique frames are
    i.i.d. stationary noise, orientation-free) must preserve exactly
    this structure."""
    from romanimpreprocess_tpu.pipeline import sim_to_l1

    nvec = (1, 2, 2)
    nside, cw, nb = 64, 8, 4
    c_pink, u_pink = 5.0, 2.0
    core = sim_to_l1._fill_core_factory(
        nvec, nside, cw, nb, True, False, im_is_active=True,
    )
    na = nside - 2 * nb
    arrs = {
        "im": np.full((3, na, na), 1000.0, np.float32),
        "read_sigma": np.zeros((nside, nside), np.float32),
        "resetnoise": np.zeros((nside, nside), np.float32),
        "dark_cube": np.full((3, nside, nside), 1000.0, np.float32),
        "amp33_med": np.zeros((nside, cw), np.float32),
        "c_pink": np.float32(c_pink),
        "u_pink": np.float32(u_pink),
        "m_pink": np.float32(0.0),
        "ru_pink": np.float32(0.0),
        "amp33_std": np.zeros((nside, cw), np.float32),
    }
    c01, c02, v = [], [], []
    for s in range(120):
        im, _ = core(jax.random.PRNGKey(s), arrs)
        f = np.asarray(im[0], np.float64) - 1000.0  # group 0: /sqrt(1)
        ch = f.reshape(nside, nside // cw, cw)
        # ch0 vs lane-reversed odd neighbor, and vs same-parity ch2
        c01.append(np.mean(ch[:, 0, :] * ch[:, 1, ::-1]))
        c02.append(np.mean(ch[:, 0, :] * ch[:, 2, :]))
        v.append(np.mean(ch[:, 0, :] ** 2))
    share = c_pink**2 / (c_pink**2 + u_pink**2)
    r01 = np.mean(c01) / np.mean(v)
    r02 = np.mean(c02) / np.mean(v)
    assert abs(r01 - share) < 0.05, (r01, share)
    assert abs(r02 - share) < 0.05, (r02, share)


def test_custom_poisson_large_lam_moments():
    """Above PTRS_NORMAL_LAM the sampler switches to the skew-corrected
    normal: the float32 PTRS acceptance test cancels lam-scale terms
    and measurably distorts the distribution (observed +3% variance at
    lam=1e6 before the switch).  Gate mean/var/skew at production-bright
    lam values."""
    import jax

    from romanimpreprocess_tpu.ops import rand

    n = 200_000
    for lam in (1.0e5, 1.0e6):
        key = rand.sim_key(int(lam) % 977)
        x = np.asarray(
            jax.jit(rand.poisson, static_argnums=2)(
                key, jnp.full((n,), lam, jnp.float32), (n,)
            ),
            np.float64,
        )
        m, v = x.mean(), x.var()
        skew = ((x - m) ** 3).mean() / v**1.5
        # sampling errors at n=2e5: sigma_mean ~ sqrt(lam/n),
        # sigma_var/var ~ sqrt(2/n) ~ 0.3%
        assert abs(m - lam) < 5 * np.sqrt(lam / n), (lam, m)
        assert abs(v / lam - 1.0) < 0.02, (lam, v / lam)
        assert abs(skew - 1.0 / np.sqrt(lam)) < 0.02, (lam, skew)
