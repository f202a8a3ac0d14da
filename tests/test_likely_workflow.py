"""End-to-end likelihood-fit path test (romancal_ramp_fit=True).

Mirrors the reference's romancal-likelihood checks
(``test_workflow.py:573-580, 670-705``): the L2 output carries dumo and
chisq, and the two fitters agree on common good pixels.
"""

import numpy as np
import pytest

from romanimpreprocess_tpu.dqflags import pixel
from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.pipeline import l1_to_l2, sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
N = 128
NA = N - 8


def test_likelihood_path_end_to_end(tmp_path):
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=5)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 200}
    )
    base = {
        "IN": d + "/L1.asdf", "FITSWCS": d + "/L1_asdf_wcshead.txt",
        "CALDIR": caldir, "SKYORDER": 2,
    }
    l1_to_l2.calibrateimage(dict(base, OUT=d + "/L2.asdf"))
    l1_to_l2.calibrateimage(
        dict(base, OUT=d + "/L2rc.asdf", romancal_ramp_fit=True,
             REJECTION_THRESHOLD=5.0, correct_wfi18_transient=True)
    )

    a = asdf_lite.open(d + "/L2.asdf")["roman"]
    rc = asdf_lite.open(d + "/L2rc.asdf")["roman"]
    assert rc["data"].shape == (NA, NA)
    assert "dumo" in rc and "chisq" in rc
    assert rc["dumo"].dtype == np.float16
    assert rc["chisq"].dtype == np.float16
    # WFI18 correction marked N/A for this detector
    assert rc["meta"]["cal_step"]["wfi18_transient"] == "N/A"

    good = (np.asarray(a["dq"]) == 0) & (np.asarray(rc["dq"]) == 0)
    assert good.mean() > 0.7
    data_c = np.asarray(a["data"])
    data_l = np.asarray(rc["data"])
    err_c = np.asarray(a["err"])
    err_l = np.asarray(rc["err"])
    assert np.isfinite(data_l[good]).all()

    # median uncertainties within 5% (reference cross-fitter gate,
    # test_workflow.py:690-696: 0.95 < ratio < 1.05)
    for name, m_c, m_l in [
        ("err", err_c, err_l),
        ("var_poisson", np.asarray(a["var_poisson"]),
         np.asarray(rc["var_poisson"])),
    ]:
        ratio = np.median(m_l[good]) / np.median(m_c[good])
        assert 0.95 < ratio < 1.05, (name, ratio)
    # the two fits agree well within their reported uncertainty
    # (reference gate: mad_std((local-rc)/err) < 0.05)
    z = (data_l - data_c)[good] / np.maximum(err_c[good], 1e-5)
    mad = np.median(np.abs(z - np.median(z))) * 1.4826
    assert mad < 0.05, mad
    # cosmic-ray counts comparable (reference: jump_rc < 2 * jump_local;
    # the likelihood fitter is two-sided so it may flag a few more)
    j_c = ((np.asarray(a["dq"]) & pixel.JUMP_DET) != 0).sum()
    j_l = ((np.asarray(rc["dq"]) & pixel.JUMP_DET) != 0).sum()
    assert j_l > 0
    assert 0.5 * j_c <= j_l <= 2 * max(j_c, 1), (j_c, j_l)


def test_likely_two_sided_jump(tmp_path):
    """The likelihood fitter flags negative outliers too (two-sided
    chi^2 statistic, Brandt 2024), unlike the one-sided classic fitter
    (reference utils/fitting.py:249-251)."""
    import jax.numpy as jnp

    from romanimpreprocess_tpu.ops import likely, ramp

    rp = [[0], [1], [2], [3], [4], [5], [6], [7]]
    meta = ramp.ma_table_meta(rp, 3.04)
    meta["nborder"] = 0
    plan = likely.build_likely_plan(meta, exclude_first=False,
                                    rejection_threshold=4.5)
    ny = nx = 16
    ngrp = len(rp)
    t = meta["tbar"]
    rng = np.random.default_rng(3)
    slope_true = 5.0  # DN/s, high S/N so the outlier is unambiguous
    data = slope_true * t[:, None, None] + rng.normal(
        0, 0.5, (ngrp, ny, nx)
    )
    # a -200 DN step (e.g. cosmic ray in a reference-subtracted frame
    # neighborhood) between groups 4 and 5 at one pixel
    data[5:, 8, 8] -= 200.0
    data = jnp.asarray(data, jnp.float32)
    rdq = jnp.zeros((ngrp, ny, nx), jnp.uint32)
    pdq = jnp.zeros((ny, nx), jnp.uint32)
    gain = jnp.full((ny, nx), 1.5, jnp.float32)
    sig = jnp.full((ny, nx), 0.5, jnp.float32)
    out = likely.ramp_fit_likely(data, rdq, pdq, plan, gain, sig, nborder=1)
    rdq_out = np.asarray(out[3])
    assert (rdq_out[:, 8, 8] & pixel.JUMP_DET).any()
    # and the refit on the clean prefix recovers the true slope
    slope = np.asarray(out[0])
    assert abs(slope[8, 8] - slope_true) < 0.5


def test_jump_kw_config_key(tmp_path):
    """JUMP_KW (reference gen_cal_image.py:428) maps onto the internal
    fitter: rejection_threshold inside JUMP_KW wins over the top-level
    default, a huge threshold suppresses jump flags, and unknown keys
    are logged (not fatal)."""
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=3)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=7)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 300}
    )
    base = {
        "IN": d + "/L1.asdf", "FITSWCS": d + "/L1_asdf_wcshead.txt",
        "CALDIR": caldir, "SKYORDER": 2, "romancal_ramp_fit": True,
    }
    l1_to_l2.calibrateimage(
        dict(base, OUT=d + "/L2_def.asdf", REJECTION_THRESHOLD=4.0)
    )
    l1_to_l2.calibrateimage(
        dict(base, OUT=d + "/L2_kw.asdf",
             JUMP_KW={"rejection_threshold": 1e4, "not_a_real_key": 1})
    )
    jd = np.uint32(pixel.JUMP_DET)
    n_def = int(((np.asarray(
        asdf_lite.open(d + "/L2_def.asdf")["roman"]["dq"]) & jd) != 0).sum())
    n_kw = int(((np.asarray(
        asdf_lite.open(d + "/L2_kw.asdf")["roman"]["dq"]) & jd) != 0).sum())
    assert n_kw < n_def  # huge threshold suppresses jump rejection
    log = asdf_lite.open(d + "/L2_kw.asdf")["processinfo"]["log"]
    assert "not_a_real_key" in str(log)


def test_noise_stack_on_likelihood_path(tmp_path):
    """The staged device noise engine must run on the likelihood-fitter
    plan too (weights_out = the central-u full-ramp weights): layer
    cubes come back finite with sane spread (reference: the NOISE block
    composes with either fitter, gen_cal_image.py:415-445)."""
    from romanimpreprocess_tpu.pipeline import noise

    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=3)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=9)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 400}
    )
    c2 = {
        "IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
        "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
        "SKYORDER": 2, "SLICEOUT": True, "romancal_ramp_fit": True,
        "NOISE": {"LAYER": ["Rz4S2", "O"], "SEED": 77,
                  "BACKEND": "device-strict",
                  "OUT": d + "/nz.asdf"},
    }
    l1_to_l2.calibrateimage(c2)
    cube = noise.generate_all_noise(c2)
    nz = np.asarray(asdf_lite.open(d + "/nz.asdf")["noise"])
    assert nz.shape == (2, NA, NA)
    good = np.asarray(
        asdf_lite.open(d + "/L2.asdf")["roman"]["dq"]) == 0
    for j in range(2):
        x = nz[j][good]
        assert np.isfinite(x).all()
        assert abs(np.median(x)) < 0.3
        assert 0.05 < np.percentile(x, 95) - np.percentile(x, 5) < 50.0
