"""Fused Pallas IPC-inverse kernel vs the XLA stencil (interpret mode).

The TPU-compiled path is exercised by bench.py on hardware; here the
kernel's math is verified against the reference stencil formulation on
the CPU interpreter at several geometries (tile-aligned and not,
with/without gain conjugation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from romanimpreprocess_tpu.ops import ipc, ipc_pallas

rng = np.random.RandomState(0)


def _mk(G, na):
    cube = jnp.asarray(rng.uniform(0, 1000, (G, na, na)).astype(np.float32))
    K = rng.uniform(0, 0.02, (3, 3, na, na)).astype(np.float32)
    K[1, 1] = 1 - K.sum(axis=(0, 1)) + K[1, 1]
    return cube, jnp.asarray(K)


@pytest.mark.parametrize("na,th", [(96, 16), (100, 16), (64, 8)])
def test_pallas_matches_xla(na, th):
    cube, K = _mk(2, na)
    want = np.array(ipc.ipc_rev(cube, K, order=2))
    got = np.array(
        ipc_pallas.ipc_rev2_cube_blocked(cube, K, th=th, interpret=True)
    )
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5


def test_pallas_gain_conjugation():
    cube, K = _mk(3, 96)
    g = jnp.asarray(rng.uniform(1.4, 1.6, (96, 96)).astype(np.float32))
    want = np.array(ipc.ipc_rev(cube, K, order=2, gain=g))
    got = np.array(
        ipc_pallas.ipc_rev2_cube_blocked(cube, K, gain=g, interpret=True)
    )
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5


def test_pallas_correct_cube_border():
    """correct_cube_fused leaves the reference border untouched."""
    G, nside, nb = 2, 104, 4
    na = nside - 2 * nb
    data = jnp.asarray(
        rng.uniform(0, 1000, (G, nside, nside)).astype(np.float32)
    )
    K = rng.uniform(0, 0.01, (3, 3, na, na)).astype(np.float32)
    K[1, 1] = 1 - K.sum(axis=(0, 1)) + K[1, 1]
    K = jnp.asarray(K)
    want = np.array(ipc.correct_cube(data, K, nborder=nb))
    got = np.array(
        ipc_pallas.correct_cube_fused(data, K, nborder=nb, interpret=True)
    )
    assert np.array_equal(got[:, :nb, :], np.array(data)[:, :nb, :])
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5


def test_fused_linearity_matches_xla_path():
    """apply_linearity_cube_fused (interpret) == apply_linearity_cube:
    bit-exact dq, float32-roundoff phi, including the dq-feedback
    fallback and non-aligned shapes (padding path)."""
    import numpy as np

    from romanimpreprocess_tpu.dqflags import pixel
    from romanimpreprocess_tpu.ops import linearity, linearity_pallas

    rng = np.random.RandomState(7)
    for ny, nx in ((24, 128), (20, 130)):
        ngrp = 4
        coefs = jnp.asarray(
            rng.randn(6, ny, nx).astype(np.float32) * 0.1
            + np.array([0, 3e4, 0, 0, 0, 0], np.float32)[:, None, None])
        smin = jnp.asarray(rng.rand(ny, nx).astype(np.float32) * 100)
        smax = smin + 40000
        dq = jnp.asarray(
            (rng.rand(ny, nx) < 0.05).astype(np.uint32)
            * np.uint32(pixel.NO_LIN_CORR)
            | (rng.rand(ny, nx) < 0.05).astype(np.uint32)
            * np.uint32(pixel.REFERENCE_PIXEL))
        lin = linearity.LinearityData(coefs, smin, smax, smin + 200.0, dq)
        S = jnp.asarray(
            smin[None] + rng.rand(ngrp, ny, nx).astype(np.float32) * 5e4
            - 2000)
        att = jnp.asarray(rng.rand(ngrp, ny, nx) < 0.9)
        for dnff in (True, False):
            ref, dq_ref = linearity.apply_linearity_cube(
                S, lin, do_not_flag_first=dnff, attempt_corr=att)
            got, dq_got = linearity_pallas.apply_linearity_cube_fused(
                S, lin, att, do_not_flag_first=dnff, th=8, interpret=True)
            assert (np.asarray(dq_ref) == np.asarray(dq_got)).all()
            r, g = np.asarray(ref), np.asarray(got)
            assert np.allclose(r, g, rtol=5e-7, atol=1e-2), (
                ny, nx, dnff, np.abs(r - g).max())


def test_block_nanmedian_fused_bit_identical():
    """The Pallas block-median kernel (interpret) is bit-identical to
    sky.block_nanmedian and np.nanmedian, incl. NaNs, all-NaN blocks,
    and non-aligned widths."""
    import warnings

    import numpy as np

    from romanimpreprocess_tpu.ops import median_pallas, sky

    rng = np.random.RandomState(1)
    for ny, nx, N in ((64, 64, 8), (72, 68, 8), (128, 120, 4)):
        arr = rng.randn(ny, nx).astype(np.float32) * 100
        arr[rng.rand(ny, nx) < 0.2] = np.nan
        arr[: ny // N, : nx // N] = np.nan
        ref = np.asarray(sky.block_nanmedian(jnp.asarray(arr), N))
        got = np.asarray(median_pallas.block_nanmedian_fused(
            jnp.asarray(arr), N, interpret=True))
        assert ((ref == got) | (np.isnan(ref) & np.isnan(got))).all()
        ky, kx = ny // N, nx // N
        py, px = (ny % N) // 2, (nx % N) // 2
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            oracle = np.nanmedian(
                arr[py : py + N * ky, px : px + N * kx]
                .reshape(N, ky, N, kx), axis=(1, 3))
        assert ((oracle == got) | (np.isnan(oracle) & np.isnan(got))).all()


@pytest.mark.parametrize("na,th", [(96, 16), (100, 16), (64, 8)])
def test_pallas_fwd_matches_xla(na, th):
    """The single-application forward kernel (the sim IL model's hot
    stencil, reference ``ipc_linearity.IL.apply:481-483``) matches the
    XLA ``ipc_fwd`` with and without gain conjugation."""
    cube, K = _mk(3, na)
    want = np.array(ipc.ipc_fwd(cube, K))
    got = np.array(
        ipc_pallas.ipc_fwd_cube_blocked(cube, K, th=th, interpret=True)
    )
    assert np.allclose(want, got, rtol=1e-6, atol=1e-3), (
        np.abs(want - got).max()
    )
    g = jnp.asarray(1.4 + 0.2 * rng.uniform(size=(na, na)).astype(np.float32))
    want = np.array(ipc.ipc_fwd(cube, K, gain=g))
    got = np.array(
        ipc_pallas.ipc_fwd_cube_blocked(cube, K, gain=g, th=th,
                                        interpret=True)
    )
    assert np.allclose(want, got, rtol=1e-6, atol=1e-3)


@pytest.mark.parametrize("na,th", [(96, 16), (100, 16)])
def test_prepadded_kernel_matches_inline_pad(na, th):
    """kernel_planes_padded + the 3-D kernel form of the blocked
    kernels is bit-identical to the in-jit pad path (the pre-padded
    slab is the production fast path; see l1_to_l2.make_core)."""
    cube, K = _mk(2, na)
    Kp = jnp.asarray(ipc_pallas.kernel_planes_padded(np.asarray(K), th=th))
    for fn in (ipc_pallas.ipc_rev2_cube_blocked,
               ipc_pallas.ipc_fwd_cube_blocked):
        want = np.array(fn(cube, K, th=th, interpret=True))
        got = np.array(fn(cube, Kp, th=th, interpret=True))
        assert np.array_equal(got, want)


def test_prepadded_kernel_th_mismatch_raises():
    _, K = _mk(1, 96)
    Kp = jnp.asarray(ipc_pallas.kernel_planes_padded(np.asarray(K), th=8))
    cube, _ = _mk(1, 96)
    with pytest.raises(ValueError, match="slab geometry"):
        ipc_pallas.ipc_rev2_cube_blocked(cube, Kp, th=16, interpret=True)


@pytest.mark.parametrize("na,th", [(96, 16), (100, 16), (64, 8)])
def test_stream_bitexact_vs_blocked(na, th):
    """The single-read ring-buffer form must be BIT-identical to the
    blocked (three-halo-window) kernel — same tap math, same order."""
    cube, K = _mk(2, na)
    a = np.array(
        ipc_pallas.ipc_rev2_cube_blocked(cube, K, th=th, interpret=True))
    b = np.array(
        ipc_pallas.ipc_rev2_cube_stream(cube, K, th=th, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_stream_gain_and_padded_kernel():
    cube, K = _mk(3, 96)
    g = jnp.asarray(rng.uniform(1.4, 1.6, (96, 96)).astype(np.float32))
    a = np.array(
        ipc_pallas.ipc_rev2_cube_blocked(cube, K, gain=g, th=8,
                                         interpret=True))
    Kp = jnp.asarray(ipc_pallas.kernel_planes_padded(np.asarray(K), th=8))
    b = np.array(
        ipc_pallas.ipc_rev2_cube_stream(cube, Kp, gain=g, th=8,
                                        interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("nside,th,nb", [(64, 8, 4), (96, 16, 4), (64, 16, 2)])
def test_frame_stream_matches_chain_glue(nside, th, nb):
    """ipc_rev2_frame_stream == the chain glue it replaces: active
    slice * gain -> zero-fill order-2 inverse -> / gain -> merged back
    into the frame with the border passed through untouched."""
    G = 3
    na = nside - 2 * nb
    data = jnp.asarray(
        rng.uniform(0, 1000, (G, nside, nside)).astype(np.float32))
    K = rng.uniform(0, 0.02, (3, 3, na, na)).astype(np.float32)
    K[1, 1] = 1 - K.sum(axis=(0, 1)) + K[1, 1]
    K = jnp.asarray(K)
    gain = jnp.asarray(
        rng.uniform(1.4, 1.6, (nside, nside)).astype(np.float32))

    gain_act = gain[nb:-nb, nb:-nb]
    corr = ipc.ipc_rev(data[:, nb:-nb, nb:-nb] * gain_act[None], K,
                       order=2)
    want = np.asarray(
        data.at[:, nb:-nb, nb:-nb].set(corr / gain_act[None]))

    kf = ipc_pallas.kernel_planes_frame(np.asarray(K), nside, nb)
    got = np.asarray(ipc_pallas.ipc_rev2_frame_stream(
        data, jnp.asarray(kf), gain, nborder=nb, th=th, interpret=True))

    # border passthrough is exact
    border = np.ones((nside, nside), bool)
    border[nb:-nb, nb:-nb] = False
    np.testing.assert_array_equal(got[:, border], np.asarray(data)[:, border])
    rel = (np.abs(got - want)[:, ~border].max()
           / np.abs(want)[:, ~border].max())
    assert rel < 1e-5


def test_frame_stream_raw_kernel_embed_matches_prepped():
    """The in-jit raw-kernel embed fallback equals the cached
    kernel_planes_frame fast path."""
    nside, nb, th = 64, 4, 8
    G, na = 2, nside - 2 * nb
    data = jnp.asarray(
        rng.uniform(0, 1000, (G, nside, nside)).astype(np.float32))
    K = rng.uniform(0, 0.02, (3, 3, na, na)).astype(np.float32)
    K[1, 1] = 1 - K.sum(axis=(0, 1)) + K[1, 1]
    gain = jnp.asarray(
        rng.uniform(1.4, 1.6, (nside, nside)).astype(np.float32))
    kf = ipc_pallas.kernel_planes_frame(K, nside, nb)
    a = np.asarray(ipc_pallas.ipc_rev2_frame_stream(
        data, jnp.asarray(kf), gain, nborder=nb, th=th, interpret=True))
    b = np.asarray(ipc_pallas.ipc_rev2_frame_stream(
        data, jnp.asarray(K), gain, nborder=nb, th=th, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_prepare_inputs_wires_frame_backend(tmp_path):
    """IPC_BACKEND: pallas-frame sets the cfg flag and stages the
    border-zeroed frame kernel planes (host prep only — the kernel
    itself is TPU-gated and covered by the interpret-mode parity
    tests above)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from romanimpreprocess_tpu.io import asdf_lite, calfiles
    from romanimpreprocess_tpu.pipeline import l1_to_l2, sim_to_l1
    from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

    d = str(tmp_path)
    rp = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
    reads = []
    for g in rp:
        reads += [g[0], g[-1] + 1]
    caldir = make_cal_files(d + "/cal", rp, nside=64, seed=3)
    scene = make_scene_file(d + "/t_F184_1_1.fits", nside_active=56)
    sim_to_l1.run_config({"IN": scene, "OUT": d + "/L1.asdf",
                          "READS": reads, "CALDIR": caldir, "SEED": 9})
    config = {"IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
              "CALDIR": caldir, "SKYORDER": 0,
              "IPC_BACKEND": "pallas-frame"}
    pack = calfiles.load_caldir_cached(caldir)
    l1 = asdf_lite.open(config["IN"])["roman"]
    prep = l1_to_l2.prepare_inputs(l1, config, pack)
    assert prep["cfg"]["ipc_frame"] is True
    assert not prep["cfg"]["ipc_pallas"]
    kf = np.asarray(prep["arr"]["ipc_kernel_frame"])
    assert kf.shape == (9, 64, 64)
    assert (kf[:, :4, :] == 0).all() and (kf[:, :, -4:] == 0).all()
