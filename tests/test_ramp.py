"""Ramp fit + jump detection vs a direct numpy oracle.

The oracle reproduces the reference algorithm's control flow literally
(Python loops over pairs, sequential truncated refits per saturation
layer — ``fitting.py:89-355``); the framework's masked dense
single-pass implementation must produce identical flags and slopes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from romanimpreprocess_tpu.dqflags import group as gdq
from romanimpreprocess_tpu.dqflags import pixel
from romanimpreprocess_tpu.ops import ramp

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
DT = 3.04


def _oracle_jump_detect(data, meta, K, gain, read_sigma, jp, truncate=None,
                        exclude_first=True, nborder=1):
    """Literal re-statement of the reference jump_detect loop (numpy)."""
    ngrp = meta["ngrp"] if truncate is None else truncate
    start = 1 if exclude_first else 0
    ny, nx = data.shape[1:]
    if truncate is not None:
        K = np.zeros(ngrp)
        K[-1] = 1.0 / (meta["tbar"][ngrp - 1] - meta["tbar"][start])
        K[start] = -K[-1]
    slope = np.einsum("t,tij->ij", K[:ngrp], data[:ngrp] - data[1][None])
    coef = 0.0
    for i in range(start, ngrp):
        coef += K[i] ** 2 * meta["tau"][i]
        for j in range(start, i):
            coef += 2.0 * K[i] * K[j] * meta["tbar"][j]
    dvardt = np.clip(slope / np.clip(gain, 1e-4, 1e4), 0.0, None)
    sep = np.sqrt(np.clip(coef * dvardt, 0, None))
    ser = read_sigma * np.sqrt(np.sum(K[:ngrp] ** 2 / meta["N"][:ngrp]))
    sig2read = read_sigma**2

    x = np.clip(slope, jp["IthreshA"], jp["IthreshB"])
    x = np.log(x / jp["IthreshA"]) / np.log(jp["IthreshB"] / jp["IthreshA"])
    sthresh = jp["SthreshA"] + (jp["SthreshB"] - jp["SthreshA"]) * x

    flags = np.zeros((meta["ngrp"], ny, nx), np.uint32)
    nb = nborder
    for i in range(start, ngrp - 1):
        dimax = 2
        if i == ngrp - 2 or ngrp - 1 - start == 2:
            dimax = 1
        for di in range(1, 1 + dimax):
            dtb = meta["tbar"][i + di] - meta["tbar"][i]
            ds = (data[i + di] - data[i]) / dtb - slope
            w = np.zeros(ngrp)
            w[i + di] = 1.0 / dtb
            w[i] = -1.0 / dtb
            w -= K[:ngrp]
            var = np.zeros((ny, nx))
            for a in range(ngrp):
                var += w[a] ** 2 * (dvardt * meta["tau"][a] + sig2read / meta["N"][a])
                for b in range(a):
                    var += 2 * w[a] * w[b] * dvardt * meta["tbar"][b]
            smap = ds / np.sqrt(var)
            flags[i, nb:-nb, nb:-nb] |= np.where(
                smap[nb:-nb, nb:-nb] > sthresh[nb:-nb, nb:-nb], pixel.JUMP_DET, 0
            ).astype(np.uint32)
    return slope, ser, sep, flags


def _oracle_ramp_fit(data, rdq, pdq, meta, K, gain, read_sigma, jp,
                     exclude_first=True, nborder=1):
    """Literal re-statement of reference ramp_fit (fitting.py:258-355)."""
    start = 1 if exclude_first else 0
    slope, ser, sep, flags = _oracle_jump_detect(
        data, meta, K, gain, read_sigma, jp, None, exclude_first, nborder
    )
    rdq = rdq.copy()
    unsat = (~rdq[-1] & pixel.SATURATED) != 0
    rdq |= np.where(unsat[None], flags, 0).astype(np.uint32)
    for iend in range(meta["ngrp"] - 1, 2 + start, -1):
        layer = (rdq[iend] & ~rdq[iend - 1] & pixel.SATURATED) != 0
        s_, ser_, sep_, fl_ = _oracle_jump_detect(
            data, meta, K, gain, read_sigma, jp, iend, exclude_first, nborder
        )
        slope = np.where(layer, s_, slope)
        ser = np.where(layer, ser_, ser)
        sep = np.where(layer, sep_, sep)
        rdq |= np.where(layer[None], fl_, 0).astype(np.uint32)

    pdq = pdq.copy()
    dnu = np.uint32(pixel.DO_NOT_USE)
    pdq2 = np.zeros_like(pdq)
    pdq2 |= np.bitwise_or.reduce(
        np.where(~rdq & pixel.SATURATED != 0, rdq, 0), axis=0
    ).astype(np.uint32) & ~dnu
    pdq2 |= np.where(
        np.bitwise_and.reduce(rdq & pixel.DO_NOT_USE != 0, axis=0), dnu, 0
    ).astype(np.uint32)
    pdq2 |= np.where(rdq[1 + start] & pixel.SATURATED != 0, dnu, 0).astype(np.uint32)
    pdq2 |= np.bitwise_or.reduce(rdq & pixel.SATURATED, axis=0)
    pdq |= np.where(~pdq & pixel.REFERENCE_PIXEL != 0, pdq2, 0)
    return slope, ser, sep, rdq, pdq


def _make_case(seed=0, ny=24, nx=24, exclude_first=True,
               read_pattern=READ_PATTERN):
    rng = np.random.RandomState(seed)
    meta = ramp.ma_table_meta(read_pattern, DT)
    ngrp = meta["ngrp"]
    gain = rng.uniform(1.4, 1.6, (ny, nx)).astype(np.float32)
    read_sigma = rng.uniform(5, 8, (ny, nx)).astype(np.float32)
    rate = rng.uniform(0.1, 50.0, (ny, nx)).astype(np.float32)
    data = rate[None] * meta["tbar"][:, None, None].astype(np.float32)
    data += rng.normal(0, 5, data.shape).astype(np.float32)
    # plant jumps: big steps at random groups
    jy, jx = rng.randint(2, ny - 2, 20), rng.randint(2, nx - 2, 20)
    jg = rng.randint(1, ngrp, 20)
    for y, x, g in zip(jy, jx, jg):
        data[g:, y, x] += 3000.0
    # plant saturation at various first-sat groups
    rdq = np.zeros((ngrp, ny, nx), np.uint32)
    for k, g0 in enumerate(range(2, ngrp)):
        rdq[g0:, 1 + k, 5] |= pixel.SATURATED
    rdq[:, 3, 3] |= pixel.SATURATED  # saturated everywhere
    if exclude_first:
        rdq[0] |= gdq.DO_NOT_USE
    pdq = np.zeros((ny, nx), np.uint32)
    pdq[0, :] |= pixel.REFERENCE_PIXEL
    data = data.astype(np.float32)
    return meta, data, rdq, pdq, gain, read_sigma


def _run_both(exclude_first, seed=0, read_pattern=READ_PATTERN):
    meta, data, rdq, pdq, gain, read_sigma = _make_case(
        seed, exclude_first=exclude_first, read_pattern=read_pattern
    )
    jp = dict(SthreshA=5.5, SthreshB=4.5, IthreshA=1.0, IthreshB=1000.0)
    u = 0.4 / 1.8 / 6.5**2
    K = ramp.casertano_weights(u, meta, exclude_first)
    plan = ramp.build_plan(meta, u, exclude_first, jp)
    got = ramp.ramp_fit(
        jnp.array(data), jnp.array(rdq), jnp.array(pdq), plan,
        jnp.array(gain), jnp.array(read_sigma), nborder=1,
    )
    want = _oracle_ramp_fit(
        data.astype(np.float64), rdq, pdq, meta, K.astype(np.float64),
        gain, read_sigma, jp, exclude_first, nborder=1,
    )
    return got, want


def test_weights_zero_sum_and_sign():
    meta = ramp.ma_table_meta(READ_PATTERN, DT)
    K = ramp.casertano_weights(0.4 / 1.8 / 6.5**2, meta, True)
    assert abs(K.sum()) < 1e-5
    assert K[0] == 0.0
    # weights should increase with time overall (positive late, negative early)
    assert K[-1] > 0 and K[1] < 0


def test_ramp_fit_matches_oracle_exclude_first():
    (slope, ser, sep, rdq_o, pdq_o), (s_w, ser_w, sep_w, rdq_w, pdq_w) = _run_both(True)
    assert np.array_equal(np.array(rdq_o), rdq_w)
    assert np.array_equal(np.array(pdq_o), pdq_w)
    assert np.allclose(np.array(slope), s_w, rtol=2e-4, atol=2e-3)
    assert np.allclose(np.array(ser), ser_w, rtol=2e-4, atol=1e-4)
    assert np.allclose(np.array(sep), sep_w, rtol=2e-4, atol=1e-3)


def test_ramp_fit_matches_oracle_include_first():
    (slope, ser, sep, rdq_o, pdq_o), (s_w, ser_w, sep_w, rdq_w, pdq_w) = _run_both(False)
    assert np.array_equal(np.array(rdq_o), rdq_w)
    assert np.array_equal(np.array(pdq_o), pdq_w)
    assert np.allclose(np.array(slope), s_w, rtol=2e-4, atol=2e-3)


def test_slope_recovers_rate_no_noise():
    meta = ramp.ma_table_meta(READ_PATTERN, DT)
    ny = nx = 8
    rate = np.full((ny, nx), 7.5, np.float32)
    data = rate[None] * meta["tbar"][:, None, None].astype(np.float32) + 100.0
    u = 0.4 / 1.8 / 6.5**2
    plan = ramp.build_plan(meta, u, True, None)
    slope, *_ = ramp.ramp_fit(
        jnp.array(data),
        jnp.zeros((meta["ngrp"], ny, nx), jnp.uint32),
        jnp.zeros((ny, nx), jnp.uint32),
        plan, jnp.full((ny, nx), 1.5), jnp.full((ny, nx), 6.0), nborder=1,
    )
    assert np.allclose(np.array(slope), 7.5, atol=1e-4)


@pytest.mark.parametrize("read_pattern,exclude_first", [
    ([[0], [1], [2], [3]], True),                 # all singleton groups
    ([[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]], False),  # minimum ngrp
    ([[0], [5, 6], [20, 21, 22, 23, 24], [40]], True),      # long gaps
    ([[0], [1, 2], [3], [4, 5, 6, 7, 8, 9], [10]], False),  # mixed sizes
])
def test_ramp_fit_matches_oracle_other_ma_tables(read_pattern,
                                                 exclude_first):
    """The masked-dense fitter must match the sequential oracle for
    arbitrary MA tables, not just the default one (the plan math -
    Casertano weights, variance coefficients, variant tables - depends
    on group sizes/timing in several places)."""
    (slope, ser, sep, rdq_o, pdq_o), (s_w, ser_w, sep_w, rdq_w, pdq_w) = \
        _run_both(exclude_first, seed=3, read_pattern=read_pattern)
    assert np.array_equal(np.array(rdq_o), rdq_w)
    assert np.array_equal(np.array(pdq_o), pdq_w)
    assert np.allclose(np.array(slope), s_w, rtol=2e-4, atol=2e-3)
    assert np.allclose(np.array(ser), ser_w, rtol=2e-4, atol=1e-4)
    assert np.allclose(np.array(sep), sep_w, rtol=2e-4, atol=1e-3)
