"""Fused device noise-exposure core vs the host noise engine.

The single-program noise stack (``pipeline/noise_core.py``) must
reproduce the statistical content of every layer of the host engine
(``pipeline/noise.py``) — same base pipeline, same weight vectors and
tilde-nus, independent RNG streams — and be deterministic per key.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romanimpreprocess_tpu.io import asdf_lite, calfiles
from romanimpreprocess_tpu.ops import rand
from romanimpreprocess_tpu.pipeline import l1_to_l2, noise, noise_core, sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
N = 128
NA = N - 8
LAYERS = ["Rz4S2", "O", "PbrS2"]


@pytest.fixture(scope="module")
def fused(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nc"))
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=5)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 300}
    )
    config = {
        "IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
        "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
        "SKYORDER": 2, "SLICEOUT": True,
        "NOISE": {"LAYER": LAYERS, "SEED": 77, "OUT": d + "/L2_noise.asdf"},
    }
    pack = calfiles.load_caldir_cached(caldir)
    l1 = asdf_lite.open(config["IN"])["roman"]
    area_factor = l1_to_l2.area_factor_from_config(config, pack.nside)

    prep = l1_to_l2.prepare_inputs(l1, config, pack, area_factor)
    run = noise_core.make_exposure_noise_core(prep, pack, LAYERS, config)
    arrs = {
        k: jnp.asarray(v)
        for k, v in {
            **prep["arr"],
            **noise_core.fill_aux_arrays(pack, prep["geom"]),
        }.items()
    }
    cube_dev, base = run(rand.sim_key(77), arrs)
    cube_dev = np.asarray(cube_dev)

    # host engine on the same exposure
    l1_to_l2.calibrateimage(config)
    noise.generate_all_noise(config)
    cube_host = np.asarray(asdf_lite.open(d + "/L2_noise.asdf")["noise"])

    l2 = asdf_lite.open(d + "/L2.asdf")
    good = np.asarray(l2["roman"]["dq"]) == 0
    sig = np.asarray(l2["roman"]["data_withsky"])
    return cube_dev, cube_host, good, (run, arrs), sig


def _spread(x):
    return np.percentile(x, 95) - np.percentile(x, 5)


def test_shapes_and_finiteness(fused):
    cube_dev, cube_host, good, _, _ = fused
    assert cube_dev.shape == (len(LAYERS), NA, NA)
    assert np.isfinite(cube_dev).all()


@pytest.mark.parametrize("j", range(len(LAYERS)))
def test_layer_spreads_match_host(fused, j):
    cube_dev, cube_host, good, _, _ = fused
    sd = _spread(cube_dev[j][good])
    sh = _spread(cube_host[j][good])
    assert 0.75 < sd / sh < 1.33, (LAYERS[j], sd, sh)
    assert abs(np.median(cube_dev[j][good])) < 0.3


def test_o_layer_tracks_signal(fused):
    """The fused 'O' layer variance grows with intensity, like the
    host engine's (pseudo-Poisson)."""
    cube_dev, _, good, _, sig = fused
    x = cube_dev[1]
    hi = good & (sig > np.percentile(sig, 95))
    lo = good & (sig < np.percentile(sig, 50))
    assert x[hi].std() > 1.5 * x[lo].std()


def test_full_exposure_core_small():
    """The single-program sim->L1->L2->noise exposure core runs at
    small geometry: finite cube, noise layers with sane spreads, slope
    recovers the injected rate."""
    from romanimpreprocess_tpu import benchlib

    arr, prep, pack = benchlib.exposure_bundle(nside=N)
    run = noise_core.make_full_exposure_core(prep, pack, LAYERS)
    arrs = {k: jnp.asarray(v) for k, v in arr.items()}
    cube, base = run(rand.sim_key(9), arrs)
    cube = np.asarray(cube)
    assert cube.shape == (len(LAYERS), NA, NA)
    assert np.isfinite(cube).all()
    slope = np.asarray(base["slope_withsky"])[4:-4, 4:-4]
    pdq = np.asarray(base["pdq"])[4:-4, 4:-4]
    good = pdq == 0
    # injected rate 3.0 e/s -> slope ~ 3/gain DN/s (flat/area unity-ish)
    med = np.median(slope[good])
    assert 1.0 < med < 4.0, med
    for j in range(len(LAYERS)):
        s = _spread(cube[j][good])
        assert 0.005 < s < 10.0, (LAYERS[j], s)


def test_staged_runner_matches_layers():
    """The host-staged exposure runner (per-stage jits, device-resident
    intermediates) produces the same statistical layer content as the
    fused program and a finite checksum."""
    from romanimpreprocess_tpu import benchlib

    arr, prep, pack = benchlib.exposure_bundle(nside=N)
    run = noise_core.make_staged_exposure_runner(prep, pack, LAYERS)
    arrs = {k: jnp.asarray(v) for k, v in arr.items()}
    cube, base, checksum = run(rand.sim_key(9), arrs)
    cube = np.asarray(cube)
    assert np.isfinite(float(checksum))
    assert cube.shape == (len(LAYERS), NA, NA)
    assert np.isfinite(cube).all()
    good = np.asarray(base["pdq"])[4:-4, 4:-4] == 0
    # same exposure through the fused single-program core
    run_f = noise_core.make_full_exposure_core(prep, pack, LAYERS)
    cube_f, base_f = run_f(rand.sim_key(9), arrs)
    cube_f = np.asarray(cube_f)
    for j in range(len(LAYERS)):
        ss = _spread(cube[j][good])
        sf = _spread(cube_f[j][good])
        assert 0.8 < ss / sf < 1.25, (LAYERS[j], ss, sf)


def test_staged_runner_layers_independent_beyond_six():
    """With more than 6 layers every layer must still get a distinct
    RNG stream: a fixed 8-way key pool indexed mod 6 would hand layer 6
    layer 0's key (and 7 layer 1's), making their 'R' realizations
    bit-identical.  Eight identical 'R' commands (the reference
    production config ``OpenUniverse_to_L1L2.py`` runs 8 layers) must
    produce 8 pairwise-distinct noise planes."""
    from romanimpreprocess_tpu import benchlib

    layers = ["Rz4"] * 8
    arr, prep, pack = benchlib.exposure_bundle(nside=N)
    run = noise_core.make_staged_exposure_runner(prep, pack, layers)
    arrs = {k: jnp.asarray(v) for k, v in arr.items()}
    cube, base, _ = run(rand.sim_key(31), arrs)
    cube = np.asarray(cube)
    assert cube.shape[0] == 8
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.array_equal(cube[i], cube[j]), (i, j)


def test_deterministic_per_key(fused):
    _, _, _, (run, arrs), _ = fused
    c1, _ = run(rand.sim_key(123), arrs)
    c2, _ = run(rand.sim_key(123), arrs)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    c3, _ = run(rand.sim_key(124), arrs)
    assert not np.array_equal(np.asarray(c1), np.asarray(c3))


def test_staged_machinery_cached_across_layer_sets():
    """Runners for different layer SETS over the same (plan, cfg,
    geometry, MA table, cal constants) must share one machinery — a
    fresh build per runner would re-jit (and on the TPU relay,
    re-remote-compile) identical stage programs."""
    from romanimpreprocess_tpu import benchlib

    arr, prep, pack = benchlib.exposure_bundle(nside=64)
    m1 = noise_core._staged_layer_machinery(prep, pack, None)
    m2 = noise_core._staged_layer_machinery(prep, pack, None)
    assert m1 is m2
    m3 = noise_core._staged_layer_machinery(
        prep, pack, {"CONTRACT_BACKEND": "pallas"}
    )
    assert m3 is not m1 and m3.cfg["contract"] == "pallas"


def test_staged_runner_history_independent():
    """run(key2) must not depend on which keys ran before it.

    The non-'a' 'R' dark-reference L2 reads the exposure's RNG-drawn
    amp33 through the refpix correction; a dark-reference cache keyed
    only by the dark cube would replay the FIRST run's reference slope
    into every later run (observed: max abs diff 0.185 at nside=64
    before the (dark_cube, amp33)-identity keying)."""
    from romanimpreprocess_tpu import benchlib

    arr, prep, pack = benchlib.exposure_bundle(nside=64)
    run = noise_core.make_staged_exposure_runner(prep, pack, ["Rz4"])
    arrs = {k: jnp.asarray(v) for k, v in arr.items()}
    cube_a, _, _ = run(rand.sim_key(2), arrs)  # key2 alone (cold cache)
    cube_a = np.asarray(cube_a)
    run(rand.sim_key(1), arrs)                 # a different key first
    cube_b, _, _ = run(rand.sim_key(2), arrs)  # then key2 again
    assert np.array_equal(cube_a, np.asarray(cube_b))


def test_machinery_shared_across_pink_amplitudes():
    """The pink-noise amplitudes come from each SCA's 'read' cal file;
    they must ride as runtime scalars, NOT compile-time constants — a
    per-detector fill-core compile costs minutes each on the TPU relay
    and fragments mixed-SCA focal-plane batches into per-SCA machinery
    groups.  Same prep, different pink scalars -> same machinery object
    AND a (statistically) different fill: doubling c_pink visibly
    raises the common-mode banding spread."""
    import dataclasses

    from romanimpreprocess_tpu import benchlib

    arr, prep, pack = benchlib.exposure_bundle(nside=64)
    pack2 = dataclasses.replace(pack, c_pink=2.0 * pack.c_pink + 1.0)
    m1 = noise_core._staged_layer_machinery(prep, pack, None)
    m2 = noise_core._staged_layer_machinery(prep, pack2, None)
    assert m1 is m2

    aux1 = noise_core.fill_aux_arrays(pack, prep["geom"])
    aux2 = noise_core.fill_aux_arrays(pack2, prep["geom"])
    a1 = dict(arr, **aux1)
    a2 = dict(arr, **aux2)
    key = rand.sim_key(3)
    # zero the white read noise so the active-region spread isolates
    # the banding amplitude under test
    a1["read_sigma"] = a2["read_sigma"] = np.zeros_like(
        np.asarray(a1["read_sigma"])
    )
    fa1 = {k: jnp.asarray(v) for k, v in
           noise_core.fill_call_arrs(a1).items()}
    fa2 = {k: jnp.asarray(v) for k, v in
           noise_core.fill_call_arrs(a2).items()}
    src = jnp.zeros((m1.ngrp, 64, 64), jnp.uint16)
    u1, _ = m1.perturb_fill(key, src, fa1)
    u2, _ = m1.perturb_fill(key, src, fa2)
    # same key: only the banding amplitude differs; the louder c_pink
    # must widen the active-region spread
    s1 = np.std(np.asarray(u1[:, 4:-4, 4:-4], np.float32))
    s2 = np.std(np.asarray(u2[:, 4:-4, 4:-4], np.float32))
    assert s2 > s1 * 1.05, (s1, s2)
